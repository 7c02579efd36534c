"""Probe Mosaic scoped-vmem limits + latency for Jacobi kernel variants.

Mosaic allocates each loop-body vector temporary on a scoped-vmem stack
(16 MB); the transpose-based formulation holds ~84 live temporaries per
batch row and only compiles at tiny tiles. Variants:

  A. dots-only (J-matmul application) — fewest temporaries; V drifts off
     orthonormality ~1e-4 over 310 steps, correctable by one Newton-Schulz
     step outside the kernel.
  B. dots-only + per-step A symmetrization (one transpose).

Reports compile success per tile size and per-call latency.
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
except Exception:
    pass

def _jacobi_matmul_tables(k):
    """One-hot partner permutations (n_steps, k, k) for the round-robin
    Jacobi schedule (kernel variants probed by this script)."""
    from localmd_tpu.ops.linalg import _jacobi_tables

    _, perm, _, _ = _jacobi_tables(k)
    n_steps = perm.shape[0]
    p_onehot = np.zeros((n_steps, k, k), np.float32)
    for s in range(n_steps):
        for i in range(k):
            p_onehot[s, perm[s, i], i] = 1.0
    return p_onehot


from _fenced_timing import fence, measure_rtt  # noqa: E402


def make_kernel(n_steps, sweeps, symmetrize):
    def kern(a_ref, p_ref, vals_ref, vecs_ref, a_buf, v_buf):
        k = a_ref.shape[-1]
        eye = jnp.eye(k, dtype=jnp.float32)
        a_buf[:] = a_ref[:]
        v_buf[:] = jnp.zeros_like(a_ref[:]) + eye

        def step(idx, _):
            a = a_buf[:]
            v = v_buf[:]
            s = idx % n_steps
            p = p_ref[s]
            diag = jnp.sum(a * eye, axis=-1)
            ap = jax.lax.dot_general(
                a, p, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            aoff = jnp.sum(ap * eye, axis=-1)
            pd = jax.lax.dot_general(
                diag, p, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            denom = jnp.where(aoff == 0.0, 1.0, 2.0 * aoff)
            tau = (pd - diag) / denom
            sgn = jnp.where(tau >= 0.0, 1.0, -1.0)
            t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
            t = jnp.where(aoff == 0.0, 0.0, t)
            cf = 1.0 / jnp.sqrt(1.0 + t * t)
            sf = -t * cf
            j = eye[None] * cf[:, None, :] + p[None] * sf[:, None, :]
            jta = jax.lax.dot_general(
                j, a, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            a2 = jax.lax.dot_general(
                jta, j, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            if symmetrize:
                a2 = 0.5 * (a2 + jnp.swapaxes(a2, -1, -2))
            v2 = jax.lax.dot_general(
                v, j, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            a_buf[:] = a2
            v_buf[:] = v2
            return 0

        jax.lax.fori_loop(0, n_steps * sweeps, step, 0)
        vals_ref[:] = jnp.sum(a_buf[:] * eye, axis=-1)
        vecs_ref[:] = v_buf[:]

    return kern


def build(n, k, tile, sweeps, symmetrize):
    p_oh = jnp.asarray(_jacobi_matmul_tables(k))
    n_steps = p_oh.shape[0]
    kern = make_kernel(n_steps, sweeps, symmetrize)

    @jax.jit
    def run(sym):
        return pl.pallas_call(
            kern,
            grid=(n // tile,),
            in_specs=[
                pl.BlockSpec((tile, k, k), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_steps, k, k), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((tile, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, k, k), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n, k), jnp.float32),
                jax.ShapeDtypeStruct((n, k, k), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((tile, k, k), jnp.float32),
                pltpu.VMEM((tile, k, k), jnp.float32),
            ],
        )(sym, p_oh)

    return run


def main():
    rng = np.random.default_rng(0)
    n, k = 1024, 30
    m = rng.standard_normal((n, k, 40)).astype(np.float32)
    sym = jnp.asarray(m @ np.swapaxes(m, 1, 2))
    rtt = measure_rtt()
    print(f"RTT {rtt*1e3:.1f} ms", flush=True)

    for symmetrize in (False, True):
        for tile in (128, 64, 32, 16):
            try:
                run = build(n, k, tile, 10, symmetrize)
                out = run(sym)
                fence(out[0])
            except Exception as e:
                msg = str(e)
                sz = ""
                import re
                mm = re.search(r"size ([0-9.]+)M", msg)
                if mm:
                    sz = f" (stack {mm.group(1)}M)"
                print(f"sym={symmetrize} tile={tile}: COMPILE FAIL{sz}",
                      flush=True)
                continue
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(8):
                    out = run(sym)
                fence(out[0])
                best = min(best, (time.perf_counter() - t0 - rtt) / 8)
            v = np.asarray(out[0])
            V = np.asarray(out[1])
            rec = np.einsum("nij,nj,nkj->nik", V, v, V)
            rel = np.linalg.norm(rec - np.asarray(sym)) / np.linalg.norm(
                np.asarray(sym)
            )
            orth = np.abs(
                np.einsum("nij,nik->njk", V, V) - np.eye(k)
            ).max()
            print(
                f"sym={symmetrize} tile={tile}: {best*1e3:7.2f} ms  "
                f"recon {rel:.1e} orth {orth:.1e}",
                flush=True,
            )
            break  # largest compiling tile is enough per variant


if __name__ == "__main__":
    main()
