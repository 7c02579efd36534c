"""Print a stack trace for every D2H materialization during a warm run."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
import time, traceback, logging

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
from bench import make_movie, run_once

logging.getLogger("localmd_tpu").setLevel(logging.WARNING)
movie = make_movie(512, 512, 1024)
import os as _os
_os.environ["BENCH_FRAMES"] = "1024"
_, cold = run_once(movie)
print(f"cold {cold:.1f}s", flush=True)

import jax._src.array as jarray

orig = jarray.ArrayImpl._value.fget if isinstance(jarray.ArrayImpl._value, property) else None
prop = jarray.ArrayImpl.__dict__["_value"]


def traced(self):
    t0 = time.perf_counter()
    out = prop.fget(self)
    dt = (time.perf_counter() - t0) * 1e3
    if dt > 3:
        frames = [f for f in traceback.extract_stack()
                  if "/repo/" in f.filename and "trace_pulls" not in f.filename]
        where = " <- ".join(f"{os.path.basename(f.filename)}:{f.lineno}" for f in frames[-4:])
        print(f"PULL {dt:8.1f} ms  shape={getattr(self, 'shape', '?')} {where}", flush=True)
    return out


jarray.ArrayImpl._value = property(traced)
_, w = run_once(movie)
print(f"warm {w:.2f}s")
