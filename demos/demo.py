"""End-to-end localmd_tpu demo (script equivalent of the reference's
official_demo.ipynb workflow).

Generates a synthetic two-photon movie (or loads a TIFF you point it at),
runs the PMD decomposition, saves the compressed .npz, builds QC diagnostics,
and writes the per-component HTML browser.

Usage:
    python demos/demo.py [path/to/movie.tif] [output_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

import localmd_tpu
from localmd_tpu import diagnostics, sim


def main():
    movie_path = sys.argv[1] if len(sys.argv) > 1 else None
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "demo_output"
    os.makedirs(out_dir, exist_ok=True)

    # ---- 1. data ------------------------------------------------------------
    if movie_path:
        dataset = localmd_tpu.TiffArray(movie_path)
        print(f"Loaded {movie_path}: shape {dataset.shape}")
    else:
        print("No input movie given - generating a synthetic two-photon movie")
        dataset = sim.two_photon_movie(d1=128, d2=128, t=1500, n_cells=40, seed=0)

    t_total = dataset.shape[0]

    # ---- 2. decomposition ----------------------------------------------------
    pmd = localmd_tpu.localmd_decomposition(
        dataset,
        block_sizes=(32, 32),
        frame_range=min(5000, t_total),
        max_components=20,
        background_rank=15,
        temporal_avg_factor=10,
        seed=0,
    )
    print(f"Compressed to rank {pmd.rank}; shape {pmd.shape}")

    # ---- 3. save the compressed representation -------------------------------
    npz_path = os.path.join(out_dir, "decomposition.npz")
    pmd.to_npz(npz_path)
    print(f"Saved {npz_path} ({os.path.getsize(npz_path) / 1e6:.1f} MB)")

    # ---- 4. QC diagnostics ----------------------------------------------------
    # ONE streaming sweep computes all four images in bounded memory: the
    # raw source is the (lazy) dataset and the PMD side is the PMDArray
    # itself, reconstructed on device chunk by chunk — no dense denoised
    # movie is ever materialized
    qc = diagnostics.compute_qc_images(dataset, pmd)
    corr, autocorr = qc["correlation"], qc["autocorrelation"]
    pmd_cov, resid_cov = qc["pmd_cov"], qc["residual_cov"]
    fig = diagnostics.make_pmd_corr_diagnostic_plot(corr, autocorr, pmd_cov, resid_cov)
    panel_path = os.path.join(out_dir, "qc_panel")
    if hasattr(fig, "write_html"):
        fig.write_html(panel_path + ".html")
    else:
        fig.savefig(panel_path + ".png", dpi=110)
    print(f"Wrote QC panel to {panel_path}.*")

    # ---- 5. per-component browser ---------------------------------------------
    comp_dir = os.path.join(out_dir, "components")
    os.makedirs(comp_dir, exist_ok=True)
    diagnostics.plot_pmd_components(pmd, comp_dir, max_components=40)
    index = diagnostics.construct_index(comp_dir)
    print(f"Component browser: {index}")

    # ---- 6. denoised movie export + cleanup -----------------------------------
    denoised_path = os.path.join(out_dir, "denoised.tif")
    n_export = min(500, t_total)
    pmd.export_tiff(denoised_path, frames=range(n_export), dtype="uint16")
    print(f"Denoised movie: {denoised_path}")
    pmd.close()  # release device factors (host slicing keeps working)


if __name__ == "__main__":
    main()
