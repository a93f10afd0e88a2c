# vfirst kernel on hardware: oracle + timing + ablations, high-rep
import os, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
os.environ["CVGS_BENCH_ABLATION"] = "1"

import bench
from cvgpuspeedup_tpu.exec import pallas_backend

rng = np.random.default_rng(42)
frame = rng.integers(0, 256, (2160, 3840, 3)).astype(np.uint8)
rects = np.array([[i, i, 60, 120] for i in range(50)], np.int32)
pipeline = bench.build_pipeline(frame, rects)
lower = lambda p: pallas_backend.try_lower(p, interpret=False)

# confirm the new schedule is active
print("vfirst active: bake check",
      pallas_backend._exact_bf16_geometry(np.dtype(np.uint8), 64, 128,
                                          __import__("cvgpuspeedup_tpu").AspectRatio.IGNORE_AR, (60, 120)))
bench.check_on_device(pipeline, lower, bench._oracle_ignore_ar(frame, rects))

for abl in (None, "floor", "nomassage"):
    pallas_backend._ABLATION = abl
    t = bench.differential_time(pipeline, lower, reps=9)
    print(f"ablation={abl}: {t*1e6:.2f} us/batch", flush=True)
pallas_backend._ABLATION = None
JOBNS["frame"] = frame
JOBNS["rects"] = rects
JOBNS["pipeline"] = pipeline
