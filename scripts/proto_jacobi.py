"""Prototype: fixed-sweep batched cyclic Jacobi eigh for small symmetric
matrices vs jnp.linalg.eigh on TPU.

Rotations are applied as exact f32 elementwise row/column updates (static
permutation gathers + FMA on the VPU) — matmul-based application runs on the
MXU in bf16 by default and destroys convergence.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial

import jax, jax.numpy as jnp
import numpy as np


def _schedule(k):
    """Round-robin (circle method) pairings: (k-1, k//2, 2) covering every
    unordered pair exactly once per sweep."""
    arr = list(range(k))
    steps = []
    for _ in range(k - 1):
        steps.append([(min(arr[i], arr[k - 1 - i]), max(arr[i], arr[k - 1 - i]))
                      for i in range(k // 2)])
        arr = [arr[0], arr[-1]] + arr[1:-1]
    return np.array(steps, dtype=np.int32)


def _step_tables(k):
    """Static per-step tables: p_idx, q_idx (k//2,), partner perm (k,),
    sign (+1 rows that are 'p', -1 ... ) packed as numpy."""
    sched = _schedule(k)
    n_steps = sched.shape[0]
    perm = np.empty((n_steps, k), np.int32)
    pair_of = np.empty((n_steps, k), np.int32)
    is_q = np.empty((n_steps, k), np.float32)
    for t in range(n_steps):
        for slot, (p, q) in enumerate(sched[t]):
            perm[t, p] = q
            perm[t, q] = p
            pair_of[t, p] = slot
            pair_of[t, q] = slot
            is_q[t, p] = -1.0   # row p mixes in -s * row q
            is_q[t, q] = 1.0    # row q mixes in +s * row p
    return sched, perm, pair_of, is_q


@partial(jax.jit, static_argnums=(1,))
def jacobi_eigh(sym, sweeps=8):
    k0 = sym.shape[-1]
    k = k0 + (k0 % 2)
    if k != k0:
        sym = jnp.pad(sym, [(0, 0)] * (sym.ndim - 2) + [(0, 1), (0, 1)])
    sched, perm, pair_of, sgn = _step_tables(k)
    sched_d = jnp.asarray(sched)      # (n_steps, k//2, 2)
    perm_d = jnp.asarray(perm)        # (n_steps, k)
    pair_d = jnp.asarray(pair_of)     # (n_steps, k)
    sgn_d = jnp.asarray(sgn)          # (n_steps, k)
    n_steps = sched.shape[0]

    a = sym
    v = jnp.zeros_like(sym) + jnp.eye(k, dtype=sym.dtype)

    def step(carry, idx):
        a, v = carry
        pq = sched_d[idx]                       # (k//2, 2)
        pi, qi = pq[:, 0], pq[:, 1]
        diag = jnp.diagonal(a, axis1=-2, axis2=-1)   # (..., k)
        app = diag[..., pi]
        aqq = diag[..., qi]
        apq = a[..., pi, qi]
        theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
        theta = jnp.where(apq == 0.0, 0.0, theta)
        c_pair = jnp.cos(theta)                 # (..., k//2)
        s_pair = jnp.sin(theta)
        pr = perm_d[idx]                        # (k,)
        cf = c_pair[..., pair_d[idx]]           # (..., k)
        sf = s_pair[..., pair_d[idx]] * sgn_d[idx]
        # rows: (J^T A)[i,:] = c_i A[i,:] + sf_i A[partner(i),:]
        a = cf[..., :, None] * a + sf[..., :, None] * a[..., pr, :]
        # cols: (B J)[:,i] = c_i B[:,i] + sf_i B[:,partner(i)]
        a = cf[..., None, :] * a + sf[..., None, :] * a[..., :, pr]
        v = cf[..., None, :] * v + sf[..., None, :] * v[..., :, pr]
        return (a, v), None

    idxs = jnp.tile(jnp.arange(n_steps), sweeps)
    (a, v), _ = jax.lax.scan(step, (a, v), idxs)
    vals = jnp.diagonal(a, axis1=-2, axis2=-1)
    if k != k0:
        vals = vals[..., :k0]
        v = v[..., :k0, :k0]
    order = jnp.argsort(-vals, axis=-1)
    vals = jnp.take_along_axis(vals, order, axis=-1)
    v = jnp.take_along_axis(v, order[..., None, :], axis=-1)
    return vals, v


def drain(x):
    leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "ravel")]
    return float(jnp.sum(leaves[0].ravel()[:1]))


key = jax.random.PRNGKey(0)
n, k = 256, 30
m = jax.random.normal(key, (n, k, 200))
gram = jnp.matmul(m, jnp.swapaxes(m, -1, -2))
decay = jnp.exp(-jnp.arange(k) * 0.7)[None, :, None]
m2 = m * decay
gram2 = jnp.matmul(m2, jnp.swapaxes(m2, -1, -2))

for sweeps in (4, 6, 8, 10):
    for label, g in (("wellcond", gram), ("decay", gram2)):
        vals, vecs = jacobi_eigh(g, sweeps)
        vn, wn = np.asarray(vals), np.asarray(vecs)
        gn = np.asarray(g)
        recon = np.einsum("nij,nj,nkj->nik", wn, vn, wn)
        err = np.abs(recon - gn).max() / np.abs(gn).max()
        orth = np.abs(np.einsum("nij,nik->njk", wn, wn) - np.eye(k)).max()
        # compare eigenvalues to XLA eigh
        ref = np.asarray(jnp.flip(jnp.linalg.eigvalsh(g), axis=-1))
        val_err = np.abs(vn - ref).max() / np.abs(ref).max()
        print(f"sweeps={sweeps} {label:8s} recon={err:.2e} orth={orth:.2e} vals={val_err:.2e}")

f_x = jax.jit(jnp.linalg.eigh)
for nb in (256, 1024):
    g = jnp.matmul(jax.random.normal(key, (nb, k, 200)),
                   jnp.swapaxes(jax.random.normal(key, (nb, k, 200)), -1, -2))
    for label, fn in (("xla ", f_x), ("jac6", lambda x: jacobi_eigh(x, 6)),
                      ("jac8", lambda x: jacobi_eigh(x, 8))):
        drain(fn(g))
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(g)
        drain(out)
        print(f"{label} eigh batch={nb}: {(time.perf_counter()-t0)/20*1e3:7.2f} ms/call")
