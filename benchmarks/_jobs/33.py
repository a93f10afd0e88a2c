# H-first + packed-bitcast rotate + core-only widen: oracle + timing + ablations
import importlib
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ["CVGS_BENCH_ABLATION"] = "1"

# worker persists modules between jobs: force-reload the edited library
for m in [k for k in list(sys.modules) if k.startswith("cvgpuspeedup_tpu") or k == "bench"]:
    del sys.modules[m]
import bench
from cvgpuspeedup_tpu.exec import pallas_backend

rng = np.random.default_rng(42)
frame = rng.integers(0, 256, (2160, 3840, 3)).astype(np.uint8)
rects = np.array([[i, i, 60, 120] for i in range(50)], np.int32)
pipeline = bench.build_pipeline(frame, rects)
lower = lambda p: pallas_backend.try_lower(p, interpret=False)

bench.check_on_device(pipeline, lower, bench._oracle_ignore_ar(frame, rects))

for abl in (None, "nomassage", "nochain", "floor"):
    pallas_backend._ABLATION = abl
    t = bench.differential_time(pipeline, lower, reps=9)
    print(f"ablation={abl}: {t*1e6:.2f} us/batch", flush=True)
pallas_backend._ABLATION = None
JOBNS["frame"] = frame
JOBNS["rects"] = rects
JOBNS["pipeline"] = pipeline
