#!/usr/bin/env python
"""Persistent warm TPU worker (dev tool, not product code).

The axon-tunneled TPU warms its device->host transfer path once PER PROCESS
(1-20 min); this worker pays that once and then executes job files:

    benchmarks/_jobs/<name>.py       -> exec'd in this process
    benchmarks/_jobs/<name>.out      -> stdout+stderr+traceback
    benchmarks/_jobs/<name>.done     -> marker (created when finished)

Jobs share the module namespace via the JOBNS dict (persist arrays between
jobs). Stop with a job that calls sys.exit() or by `kill <pid>`
(pid in benchmarks/_jobs/worker.pid).
"""
import io
import os
import sys
import time
import traceback
import contextlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JOBS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_jobs")
os.makedirs(JOBS, exist_ok=True)
with open(os.path.join(JOBS, "worker.pid"), "w") as f:
    f.write(str(os.getpid()))

t0 = time.time()
import jax
import jax.numpy as jnp
import numpy as np  # noqa: F401

print(f"[worker] backend={jax.default_backend()} devices={jax.devices()}", flush=True)
# warm the transfer path (the only true sync on this rig)
x = jnp.sum(jnp.ones((8, 8)))
_ = np.asarray(x)
print(f"[worker] transfer path warm in {time.time()-t0:.1f}s; polling {JOBS}", flush=True)

JOBNS = {"jax": jax, "jnp": jnp, "np": np, "JOBNS": None}
JOBNS["JOBNS"] = JOBNS

while True:
    for fn in sorted(os.listdir(JOBS)):
        if not fn.endswith(".py"):
            continue
        name = fn[:-3]
        done = os.path.join(JOBS, name + ".done")
        if os.path.exists(done):
            continue
        path = os.path.join(JOBS, fn)
        buf = io.StringIO()
        t = time.time()
        try:
            with open(path) as f:
                src = f.read()
            with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
                exec(compile(src, path, "exec"), JOBNS)
        except SystemExit:
            with open(os.path.join(JOBS, name + ".out"), "w") as f:
                f.write(buf.getvalue() + "\n[worker] exiting\n")
            open(done, "w").close()
            sys.exit(0)
        except BaseException:
            buf.write("\n" + traceback.format_exc())
        buf.write(f"\n[worker] job {name} took {time.time()-t:.1f}s")
        with open(os.path.join(JOBS, name + ".out"), "w") as f:
            f.write(buf.getvalue())
        open(done, "w").close()
    time.sleep(0.5)
