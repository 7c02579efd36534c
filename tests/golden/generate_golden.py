"""Generate the committed golden parity fixture from the LIVE reference.

Runs the reference implementation (apasarkar/localmd, expected at
/root/reference) on a deterministic small movie with injected sketches and
pinned thresholds — the same construction as
tests/test_reference_parity.py::TestSketchInjectionParity — and saves the
resulting factorization in the reference .npz convention plus the dense
reconstruction, to ``reference_golden.npz`` next to this script.

The committed fixture pins today's agreed-on numbers so the <= 1e-5
Frobenius parity bar survives environments WITHOUT the reference checkout
(tests/test_golden.py skips nothing). Regenerate only if the construction
here changes, and re-commit.

Determinism notes:
- the movie uses numpy's PCG64 stream (stable across numpy versions);
- the injected sketch uses jax.random.normal(PRNGKey(1234), shape)
  (threefry; stable in practice, but a jax PRNG change would require
  regenerating this fixture — the golden test failing loudly is the point).

Run: python tests/golden/generate_golden.py
"""

import os
import sys

import numpy as np

REFERENCE_PATH = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "reference_golden.npz")


def make_movie():
    """Deterministic rank-4 movie; MUST match tests/test_reference_parity.py
    TestSketchInjectionParity._make_movie and tests/test_golden.py."""
    rng = np.random.default_rng(55)
    T, d1, d2, R = 500, 40, 36, 4
    spatial = rng.random((d1 * d2, R)).astype(np.float32)
    temporal = rng.standard_normal((R, T)).astype(np.float32)
    temporal *= np.asarray([8.0, 6.0, 4.5, 3.0], np.float32)[:, None]
    movie = (spatial @ temporal).T.reshape(T, d1, d2)
    movie += 1e-4 * rng.standard_normal(movie.shape).astype(np.float32)
    return movie.astype(np.float32), T, R


def fixed_sketch(shape):
    import jax

    return jax.random.normal(jax.random.PRNGKey(1234), shape)


def main():
    # reference imports tifffile unconditionally; stub it
    import tempfile

    shim = tempfile.mkdtemp()
    os.makedirs(os.path.join(shim, "tifffile"), exist_ok=True)
    with open(os.path.join(shim, "tifffile", "__init__.py"), "w") as f:
        f.write(
            "def imread(*a, **k):\n    raise NotImplementedError\n"
            "class TiffFile:\n    def __init__(self, *a, **k):\n"
            "        raise NotImplementedError\n"
        )
    sys.path.insert(0, shim)
    sys.path.insert(0, REFERENCE_PATH)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import localmd
    import localmd.decomposition as ref_dec
    from localmd.pmd_loader import PMDLoader as RefLoader

    def ref_trsvd_injected(input_matrix, key, rank_placeholder):
        rank = rank_placeholder.shape[0]
        t = input_matrix.shape[1]
        random_data = fixed_sketch((t, rank + 10))
        projected = jnp.matmul(input_matrix, random_data)
        q, _ = jnp.linalg.qr(projected)
        b = jnp.matmul(q.T, input_matrix)
        u, s, v = jnp.linalg.svd(b, full_matrices=False)
        return q.dot(u)[:, :rank], s[:rank], v[:rank]

    def ref_background_injected(self, n_samples=1000):
        frames = list(range(self.shape[0]))
        crop = self.temporal_crop_standardized(frames)
        mat = crop.reshape((-1, crop.shape[-1]), order=self.order)
        sk = np.asarray(fixed_sketch((mat.shape[1], self.background_rank + 10)))
        q, _ = np.linalg.qr(mat @ sk)
        u, _, _ = np.linalg.svd(q.T @ mat, full_matrices=False)
        return (q @ u)[:, : self.background_rank].astype(self.dtype)

    ref_dec.truncated_random_svd = ref_trsvd_injected
    ref_dec.threshold_heuristic = lambda *a, **k: (1e9, 1e9)
    RefLoader._calculate_background_filter = ref_background_injected

    movie, T, R = make_movie()
    np.random.seed(0)
    theirs = localmd.localmd_decomposition(
        movie, (16, 16), frame_range=T, max_components=R,
        background_rank=2, temporal_avg_factor=4,
        compute_normalizer=True, num_workers=0,
    )
    recon = theirs[:, :, :].astype(np.float32)

    u = theirs.u.tocsr()
    np.savez_compressed(
        OUT,
        fov_shape=np.asarray(movie.shape[1:]),
        fov_order=theirs.order,
        U_data=u.data.astype(np.float32),
        U_indices=u.indices,
        U_indptr=u.indptr,
        U_shape=np.asarray(u.shape),
        U_format="csr",
        R=np.asarray(theirs.r, np.float32),
        s=np.asarray(theirs.s, np.float32),
        Vt=np.asarray(theirs.v, np.float32),
        mean_img=np.asarray(theirs.mean_img, np.float32),
        noise_var_img=np.asarray(theirs.var_img, np.float32),
        recon=recon,
    )
    print(f"wrote {OUT} ({os.path.getsize(OUT) / 1e6:.2f} MB), "
          f"rank {theirs.s.shape[0]}, recon norm {np.linalg.norm(recon):.4f}")


if __name__ == "__main__":
    main()
