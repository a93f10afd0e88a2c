# probe: does vmem_limit_bytes=32M let the 6144-wide NV12 config compile+run right?
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
for m in [k for k in list(sys.modules) if k.startswith("cvgpuspeedup_tpu")]:
    del sys.modules[m]
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu
import cvgpuspeedup_tpu as cvgs
from cvgpuspeedup_tpu.exec import pallas_frame

# monkeypatch pallas_call to inject a higher scoped-vmem limit
import jax.experimental.pallas as pl
orig = pl.pallas_call
def patched(*a, **kw):
    kw.setdefault("compiler_params",
                  pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024))
    return orig(*a, **kw)
pallas_frame.pl.pallas_call = patched

rng = np.random.default_rng(1)
sw, sh = 6144, 3168
buf = rng.integers(0, 256, (sh * 3 // 2, sw)).astype(np.uint8)
ops = [cvgs.resize(cvgs.fuse(cvgs.read_yuv(buf),
                             cvgs.convert_yuv_to_rgb(
                                 standard=cvgs.ColorStandard.BT709,
                                 out_dtype=np.float32)),
                   cvgs.Size(1920, 1080)),
       cvgs.multiply(1 / 255.0), cvgs.split_tensor()]
pipe = cvgs.build_pipeline(*ops)
out = pallas_frame.try_lower(pipe, interpret=False)
p = np.asarray(out)
x = np.asarray(cvgs.execute_operations(*ops, backend=cvgs.ParBackend.XLA))
print("6144 config with 32M vmem limit: compiled; max|diff| vs XLA =",
      np.abs(p - x).max(), flush=True)
pallas_frame.pl.pallas_call = orig
