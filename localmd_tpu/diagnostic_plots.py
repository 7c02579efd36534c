"""Drop-in namespace mirroring ``localmd.diagnostic_plots``.

Reference symbol surface (reference diagnostic_plots.py) over the streaming
QC kernels in :mod:`localmd_tpu.diagnostics` — same names, bounded-memory
implementations (sources may be lazy datasets or a PMDArray), plus the
single-sweep :func:`compute_qc_images`.
"""

from localmd_tpu.diagnostics import (
    compute_qc_images,
    construct_index,
    make_autocorrelation_image,
    make_correlation_image,
    make_pmd_component_graph,
    make_pmd_corr_diagnostic_plot,
    make_pmd_correlation_image,
    make_residual_correlation_image,
    plot_pmd_components,
)

__all__ = [
    "make_pmd_corr_diagnostic_plot",
    "make_residual_correlation_image",
    "make_pmd_correlation_image",
    "make_correlation_image",
    "make_autocorrelation_image",
    "make_pmd_component_graph",
    "plot_pmd_components",
    "construct_index",
    "compute_qc_images",
]
