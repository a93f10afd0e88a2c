# bisection ablations + scheduling-knob sweep for the flagship kernel
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ["CVGS_BENCH_ABLATION"] = "1"

for m in [k for k in list(sys.modules) if k.startswith("cvgpuspeedup_tpu") or k == "bench"]:
    del sys.modules[m]
import bench
from cvgpuspeedup_tpu.exec import pallas_backend as pb

rng = np.random.default_rng(42)
frame = rng.integers(0, 256, (2160, 3840, 3)).astype(np.uint8)
rects = np.array([[i, i, 60, 120] for i in range(50)], np.int32)
pipeline = bench.build_pipeline(frame, rects)
lower = lambda p: pb.try_lower(p, interpret=False)

for abl in ("noh", "nov", "nodekker"):
    pb._ABLATION = abl
    t = bench.differential_time(pipeline, lower, reps=7)
    print(f"ablation={abl}: {t*1e6:.2f} us/batch", flush=True)
pb._ABLATION = None

# knob sweep (real kernel, correct results)
for group, slots, budget in ((10, 3, 3), (25, 2, 4), (25, 3, 6), (5, 2, 3)):
    pb._GROUP_CANDIDATES = (group,)
    pb._RING_SLOTS = slots
    pb._RING_BUDGET = budget * 1024 * 1024
    try:
        t = bench.differential_time(pipeline, lower, reps=7)
        print(f"group={group} slots={slots}: {t*1e6:.2f} us/batch", flush=True)
    except Exception as e:
        print(f"group={group} slots={slots}: FAILED {type(e).__name__}: {e}",
              flush=True)
pb._GROUP_CANDIDATES = (10, 5, 4, 3, 2)
pb._RING_SLOTS = 2
pb._RING_BUDGET = 3 * 1024 * 1024
