"""Quality-control diagnostics: correlation images + component browser.

Parity targets (reference diagnostic_plots.py):

- ``make_correlation_image``   (reference :227-272) — per-pixel max/mean
  correlation with the 8 spatial neighbors.
- ``make_autocorrelation_image`` (reference :275-305) — per-pixel lag-k
  autocorrelation.
- ``make_pmd_correlation_image`` / ``make_residual_correlation_image``
  (reference :163-224 / :101-160) — neighbor covariance of the PMD
  reconstruction / residual, scaled by the RAW movie's pixel variances so
  the three images are directly comparable.
- ``plot_pmd_components`` + ``construct_index`` (reference :363-473) —
  per-component HTML report browser.

TPU rethink: the reference computes every image with an O(d1*d2*8) host
Python loop around a tiny per-pair jit (reference :131-156, :195-220,
:249-269). Here each image is ONE jitted program: center/normalize the
movie once, then 8 shifted elementwise products with validity masks.
Numerical quirks preserved: covariance uses ddof=1 (jnp.cov), the variance
scaling uses ddof=0 (jnp.var), and "max" mode is floored at 0 by the
reference's zero-initialized accumulator.

Rendering: plotly is used if installed (reference dependency); otherwise
matplotlib renders equivalent figures into self-contained HTML (base64 PNG).
"""

from __future__ import annotations

import base64
import io
import os
import re
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

try:  # pragma: no cover - environment dependent
    import plotly  # noqa: F401

    _HAVE_PLOTLY = True
except ImportError:
    _HAVE_PLOTLY = False

# The 8 spatial neighbor offsets.
_SHIFTS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def _shifted(x: Array, dy: int, dx: int) -> Tuple[Array, Array]:
    """Shift (T, d1, d2) movie by (dy, dx) with a validity mask (d1, d2)."""
    t, d1, d2 = x.shape
    shifted = jnp.roll(x, (dy, dx), axis=(1, 2))
    yy = jnp.arange(d1)[:, None]
    xx = jnp.arange(d2)[None, :]
    valid = (
        (yy - dy >= 0) & (yy - dy < d1) & (xx - dx >= 0) & (xx - dx < d2)
    )
    return shifted, valid


def _neighbor_reduce(products, valids, mode: str):
    """Combine 8 (d1, d2) neighbor statistics into one image."""
    stacked = jnp.stack(products)           # (8, d1, d2)
    masks = jnp.stack(valids)
    if mode == "mean":
        return jnp.sum(stacked * masks, axis=0) / jnp.sum(masks, axis=0)
    if mode == "max":
        # reference accumulator starts at 0 => negative values floor at 0
        return jnp.max(jnp.where(masks, stacked, 0.0), axis=0).clip(min=0.0)
    raise ValueError(f"mode {mode} not supported")


@partial(jax.jit, static_argnums=(1,))
def _correlation_image_kernel(movie: Array, mode: str) -> Array:
    centered = movie - jnp.mean(movie, axis=0, keepdims=True)
    norm = jnp.linalg.norm(centered, axis=0, keepdims=True)
    z = centered / norm
    products, valids = [], []
    for dy, dx in _SHIFTS:
        zs, valid = _shifted(z, dy, dx)
        products.append(jnp.sum(z * zs, axis=0))
        valids.append(valid)
    return _neighbor_reduce(products, valids, mode)


def make_correlation_image(movie: np.ndarray, mode: str = "max") -> np.ndarray:
    """Per-pixel neighbor correlation of the raw movie. (T, d1, d2) -> (d1, d2)."""
    return np.asarray(_correlation_image_kernel(jnp.asarray(movie), mode))


@partial(jax.jit, static_argnums=(1,))
def _autocorrelation_kernel(movie: Array, lag: int) -> Array:
    a = movie[lag:]
    b = movie[: -lag]
    a = a - jnp.mean(a, axis=0, keepdims=True)
    b = b - jnp.mean(b, axis=0, keepdims=True)
    a = a / jnp.linalg.norm(a, axis=0, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=0, keepdims=True)
    return jnp.sum(a * b, axis=0)


def make_autocorrelation_image(movie: np.ndarray, lag: int = 1) -> np.ndarray:
    """Per-pixel lag-k autocorrelation. (T, d1, d2) -> (d1, d2)."""
    return np.asarray(_autocorrelation_kernel(jnp.asarray(movie), lag))


@partial(jax.jit, static_argnums=(2,))
def _scaled_cov_kernel(target: Array, raw: Array, mode: str) -> Array:
    """Neighbor covariance of `target`, scaled by raw-pixel std products.

    cov uses ddof=1 (jnp.cov parity), the raw variances ddof=0 (jnp.var).
    """
    t = target.shape[0]
    centered = target - jnp.mean(target, axis=0, keepdims=True)
    raw_std = jnp.sqrt(jnp.var(raw, axis=0))
    products, valids = [], []
    for dy, dx in _SHIFTS:
        cs, valid = _shifted(centered, dy, dx)
        rs, _ = _shifted(raw_std[None], dy, dx)
        cov = jnp.sum(centered * cs, axis=0) / (t - 1)
        products.append(cov / (raw_std * rs[0]))
        valids.append(valid)
    return _neighbor_reduce(products, valids, mode)


def make_pmd_correlation_image(
    original_movie: np.ndarray, pmd_movie: np.ndarray, mode: str = "max"
) -> np.ndarray:
    """Neighbor covariance of the PMD reconstruction scaled by raw variances."""
    return np.asarray(
        _scaled_cov_kernel(jnp.asarray(pmd_movie), jnp.asarray(original_movie), mode)
    )


def make_residual_correlation_image(
    original_movie: np.ndarray, pmd_movie: np.ndarray, mode: str = "max"
) -> np.ndarray:
    """Neighbor covariance of (raw - PMD) scaled by raw variances — white
    residuals give a near-zero image (QC pass)."""
    resid = jnp.asarray(original_movie) - jnp.asarray(pmd_movie)
    return np.asarray(_scaled_cov_kernel(resid, jnp.asarray(original_movie), mode))


# ---------------------------------------------------------------------------
# Figure rendering (plotly if present, else matplotlib -> standalone HTML)
# ---------------------------------------------------------------------------

def _mpl_fig_to_html(fig, title: str) -> str:
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=110, bbox_inches="tight")
    data = base64.b64encode(buf.getvalue()).decode("ascii")
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{title}</title></head><body style='text-align:center'>"
        f"<h2>{title}</h2><img src='data:image/png;base64,{data}'/>"
        "</body></html>"
    )


def make_pmd_corr_diagnostic_plot(
    standard_correlation_image: np.ndarray,
    autocorr_image: np.ndarray,
    pmd_cov_image: np.ndarray,
    residual_cov_image: np.ndarray,
):
    """2x2 QC panel (raw corr / raw autocorr / PMD cov / residual cov).

    Returns a plotly figure if plotly is installed, else a matplotlib figure.
    """
    images = [
        ("Raw Corr", standard_correlation_image),
        ("Raw Autocorr", autocorr_image),
        ("Scaled Cov(UV)", pmd_cov_image),
        ("Scaled Cov(Y - UV)", residual_cov_image),
    ]
    vmax = float(np.amax(standard_correlation_image))
    if _HAVE_PLOTLY:  # pragma: no cover
        import plotly.graph_objects as go
        from plotly.subplots import make_subplots

        fig = make_subplots(rows=2, cols=2, subplot_titles=[t for t, _ in images])
        for i, (_, img) in enumerate(images):
            fig.add_trace(
                go.Heatmap(z=np.array(img), coloraxis="coloraxis"),
                row=i // 2 + 1,
                col=i % 2 + 1,
            )
        fig.update_layout(
            title="Corr Images (PMD Weighted ACF(1) Image)",
            coloraxis=dict(colorscale="Viridis", cmin=0, cmax=vmax),
        )
        return fig

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(10, 9))
    for ax, (name, img) in zip(axes.ravel(), images):
        im = ax.imshow(np.asarray(img), vmin=0, vmax=vmax, cmap="viridis")
        ax.set_title(name)
        ax.axis("off")
    fig.colorbar(im, ax=axes.ravel().tolist(), shrink=0.8)
    fig.suptitle("Corr Images (PMD Weighted ACF(1) Image)")
    return fig


def make_pmd_component_graph(
    spatial: np.ndarray,
    mean_img: np.ndarray,
    var_img: np.ndarray,
    trace: np.ndarray,
    index: int,
    title: str,
):
    """Per-component QC figure: mean / var / spatial images + temporal trace."""
    if _HAVE_PLOTLY:  # pragma: no cover
        import plotly.graph_objects as go
        import plotly.subplots as sp

        fig = sp.make_subplots(
            rows=2,
            cols=3,
            subplot_titles=["Mean", "Var Img", f"Spatial Comp {index}",
                            f"Temporal Comp {index}"],
            specs=[
                [{"type": "heatmap"}] * 3,
                [{"colspan": 3}, None, None],
            ],
        )
        for col, img in enumerate([mean_img, var_img, spatial], start=1):
            fig.add_trace(
                go.Heatmap(z=img, showscale=False, colorscale="Viridis"),
                row=1, col=col,
            )
        fig.add_trace(go.Scatter(y=trace, mode="lines", name="Signal"), row=2, col=1)
        fig.update_layout(title=title, height=800)
        return fig

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(12, 8))
    names = ["Mean", "Var Img", f"Spatial Comp {index}"]
    for i, (name, img) in enumerate(zip(names, [mean_img, var_img, spatial])):
        ax = fig.add_subplot(2, 3, i + 1)
        ax.imshow(np.asarray(img), cmap="viridis")
        ax.set_title(name)
        ax.axis("off")
    ax = fig.add_subplot(2, 1, 2)
    ax.plot(np.asarray(trace))
    ax.set_title(f"Temporal Comp {index}")
    fig.suptitle(title)
    return fig


def plot_pmd_components(pmd_movie, folder: str, filename_prefix: str = "Component"):
    """Write one HTML QC page per component (reference :363-389)."""
    if not os.path.exists(folder):
        raise ValueError(f"folder {folder} does not exist; create it first")

    u, r, s, v = pmd_movie.u, pmd_movie.r, pmd_movie.s, pmd_movie.v
    order = pmd_movie.order
    _, d1, d2 = pmd_movie.shape
    total_var = np.sum(np.square(s))

    for i in range(r.shape[1]):
        comp = u.dot(r[:, i]).reshape((d1, d2), order=order)
        explained = np.square(s[i]) / total_var
        title = f"Comp {i}, Var explained {explained:3f}"
        name = f"{filename_prefix}_{i}.html"
        fig = make_pmd_component_graph(
            comp, pmd_movie.mean_img, pmd_movie.var_img, v[i, :], i + 1, title
        )
        path = os.path.join(folder, name)
        if _HAVE_PLOTLY:  # pragma: no cover
            fig.write_html(path)
        else:
            with open(path, "w") as f:
                f.write(_mpl_fig_to_html(fig, title))
            import matplotlib.pyplot as plt

            plt.close(fig)


def construct_index(folder: str, file_prefix: str = "Component",
                    index_name: str = "index.html") -> str:
    """Build a prev/next iframe browser over the per-component HTML pages."""

    def numerical_sort(fname):
        match = re.search(rf"{file_prefix}[_\s]*(\d+)", fname)
        return int(match.group(1)) if match else float("inf")

    html_files = sorted(
        (f for f in os.listdir(folder) if f.endswith(".html") and f != index_name),
        key=numerical_sort,
    )
    files_js = ",\n            ".join(f"'{f}'" for f in html_files)
    index_path = os.path.join(folder, index_name)
    with open(index_path, "w") as f:
        f.write(f"""<!DOCTYPE html>
<html lang="en">
<head>
  <meta charset="UTF-8">
  <title>PMD Component Browser</title>
  <style>
    body {{ font-family: sans-serif; margin: 20px; text-align: center; }}
    button {{ padding: 10px 20px; margin: 5px; font-size: 16px; }}
  </style>
</head>
<body>
  <h1>PMD Components</h1>
  <div id="content"><iframe src="" style="width:100%;height:640px;border:none"></iframe></div>
  <div>
    <button id="prev-btn" onclick="navigate(-1)">Previous</button>
    <span id="label"></span>
    <button id="next-btn" onclick="navigate(1)">Next</button>
  </div>
  <script>
    const files = [
            {files_js}
    ];
    let idx = 0;
    function load() {{
      document.getElementById('content').innerHTML =
        `<iframe src="${{files[idx]}}" style="width:100%;height:640px;border:none"></iframe>`;
      document.getElementById('label').textContent = `${{idx + 1}} / ${{files.length}}`;
      document.getElementById('prev-btn').disabled = idx === 0;
      document.getElementById('next-btn').disabled = idx === files.length - 1;
    }}
    function navigate(d) {{
      idx = Math.min(Math.max(idx + d, 0), files.length - 1);
      load();
    }}
    load();
  </script>
</body>
</html>
""")
    return index_path
