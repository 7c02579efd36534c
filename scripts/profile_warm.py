"""cProfile a warm pipeline run to locate host-side wall time.

All device compute at bench scale is ~ms; if warm wall is ~1 s it must be
visible host-side (transfer waits, tracing, numpy)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
import cProfile, pstats, time, logging

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
from bench import make_movie, run_once

logging.getLogger("localmd_tpu").setLevel(logging.WARNING)
movie = make_movie(512, 512, 2048)
_, cold = run_once(movie)
print(f"cold {cold:.1f}s", flush=True)
_, w0 = run_once(movie)
print(f"warm0 {w0:.2f}s", flush=True)

prof = cProfile.Profile()
t0 = time.perf_counter()
prof.enable()
pmd, w = run_once(movie)
prof.disable()
print(f"profiled warm {w:.2f}s")
stats = pstats.Stats(prof)
stats.sort_stats("cumulative")
stats.print_stats(35)
print("=== by tottime ===")
stats.sort_stats("tottime")
stats.print_stats(25)
print("stage timings:", pmd.pipeline_timings)
