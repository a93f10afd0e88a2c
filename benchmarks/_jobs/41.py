# group-level Dekker + group_p sweep with batched H
import os, sys
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
bench.check_on_device(pipeline, lower, bench._oracle_ignore_ar(frame, rects))

for group, budget in ((10, 3), (25, 4), (50, 8), (5, 3)):
    pb._GROUP_CANDIDATES = (group,)
    pb._RING_BUDGET = budget * 1024 * 1024
    try:
        t = bench.differential_time(pipeline, lower, reps=9)
        print(f"group={group}: {t*1e6:.2f} us/batch", flush=True)
    except Exception as e:
        print(f"group={group}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
pb._GROUP_CANDIDATES = (10, 5, 4, 3, 2)
pb._RING_BUDGET = 3 * 1024 * 1024
