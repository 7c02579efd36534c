"""Benchmark: PMD decomposition throughput on one TPU chip.

Metric (BASELINE.json): Mpixel-frames/sec/chip at 512x512 FOV — total movie
pixel-frames (d1*d2*T) divided by end-to-end pipeline wall time (statistics
pass + init + blockwise decomposition + factorized SVD + streaming V
regression). North star: 1 Gpf/s on a v5e-8 => 125 Mpf/s/chip baseline.

Prints ONE JSON line. Runs the pipeline twice and reports the warm run (the
driver runs this fresh each round; a persistent jax compilation cache
amortizes compiles across rounds).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import numpy as np


def make_movie(d1=512, d2=512, t=2048, rank=16, seed=0, dtype="float32"):
    """Synthetic low-rank + noise movie generated ON DEVICE (this box's
    host->device tunnel is ~20 MB/s; a production TPU host streams over PCIe,
    so the benchmark measures decomposition throughput, not tunnel IO).
    dtype="uint16" emits a photon-count-like scanner movie at half the HBM
    (how the 1024^2 x 4096 leg fits alongside its own working set)."""
    import jax
    import jax.numpy as jnp

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    spatial = jax.random.normal(k1, (d1 * d2, rank), dtype=jnp.float32)
    if dtype == "float32":
        temporal = jax.random.normal(k2, (rank, t), dtype=jnp.float32)
        movie = (spatial @ temporal).T.reshape(t, d1, d2)
        movie = movie + jax.random.normal(k3, (t, d1, d2), dtype=jnp.float32)
        return jax.block_until_ready(movie)

    # integer movies are generated CHUNKED: the full-movie f32 intermediate
    # of the one-shot path is 4 bytes/px-frame (16 GiB at 1024^2 x 4096 —
    # over v5e HBM by itself); per-chunk transients + the donated integer
    # buffer fit easily
    from functools import partial

    @partial(jax.jit, donate_argnums=(0,), static_argnums=(5,))
    def _fill(out, sp, kt, kn, s0, n):
        te = jax.random.normal(kt, (sp.shape[1], n), dtype=jnp.float32)
        chunk = (sp @ te).T.reshape(n, out.shape[1], out.shape[2])
        chunk = chunk + jax.random.normal(kn, chunk.shape, dtype=jnp.float32)
        chunk = jnp.clip(chunk * 40.0 + 1000.0, 0, 65535).astype(out.dtype)
        return jax.lax.dynamic_update_slice(out, chunk, (s0, 0, 0))

    step = min(512, t)
    out = jnp.zeros((t, d1, d2), dtype=dtype)
    for i, s0 in enumerate(range(0, t, step)):
        # tail remainder gets its own (one extra) compiled variant rather
        # than falling back to a whole-movie chunk
        n = min(step, t - s0)
        kt = jax.random.fold_in(k2, i)
        kn = jax.random.fold_in(k3, i)
        out = _fill(out, spatial, kt, kn, jnp.int32(s0), n)
    return jax.block_until_ready(out)


def run_once(movie, quiet=True, matmul_precision=None, blocks=(32, 32),
             frame_range=1024, block_batch_size=256):
    import logging

    import localmd_tpu

    if quiet:
        logging.getLogger("localmd_tpu").setLevel(logging.WARNING)
    t0 = time.perf_counter()
    pmd = localmd_tpu.localmd_decomposition(
        movie,
        blocks,
        frame_range=frame_range,
        max_components=20,
        background_rank=15,
        temporal_avg_factor=10,
        sim_iters=250,
        seed=0,
        block_batch_size=block_batch_size,
        rank_prune=True,  # reference demo config (official_demo.ipynb cell 4)
        matmul_precision=matmul_precision,
    )
    elapsed = time.perf_counter() - t0
    return pmd, elapsed


# Peak bf16 matmul TFLOP/s per chip by device kind substring (public specs).
_PEAK_BF16_TFLOPS = [
    ("v6e", 918.0),
    ("v6", 918.0),
    ("v5p", 459.0),
    ("v5e", 197.0),
    ("v5 lite", 197.0),
    ("v5litepod", 197.0),
    ("v4", 275.0),
]


def _chip_peak_tflops():
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        kind = ""
    for key, peak in _PEAK_BF16_TFLOPS:
        if key in kind:
            return peak, kind
    return 197.0, kind or "unknown"  # v5e default (BASELINE.json target HW)


def estimate_pipeline_flops(
    d1, d2, t, frame_range, block, max_components, background_rank,
    temporal_avg_factor, spatial_avg_factor, sim_iters, rank_prune,
    rank_prune_factor, ranks,
):
    """Model matmul FLOPs (2*m*n*k per product) of one pipeline run.

    Counts the dominant countable products per stage — Welch DFT, background
    rSVD, init background projection, threshold Monte-Carlo, per-block
    two-stage kernels, Gram quadratic + eigh, streaming V regression, final
    reformat. Elementwise traffic and small QR/SVD tails are excluded, so
    treat as a ~±20% model, good enough to place the run on the roofline.
    ``ranks`` is the pipeline's reported rank dict (pipeline_ranks).
    """
    from localmd_tpu.ops.tiling import BlockGrid

    d = d1 * d2
    b1 = b2 = block
    fl = 0.0

    # stats pass: batched Welch partial-DFT (2 matmuls x 7 segments x 64 bins)
    n_chunks = (t + 1023) // 1024
    fl += n_chunks * d * 2 * (2 * 7 * 256 * 64)
    # background rSVD over min(1000, t) standardized frames
    k_bg_sk = background_rank + 10
    n_bg = min(1000, t)
    fl += 2 * d * n_bg * k_bg_sk * 2 + 2 * d * k_bg_sk * k_bg_sk
    # init frames: standardize + project out background (2 products)
    fl += 2 * d * background_rank * frame_range * 2
    # threshold Monte-Carlo: sim_iters rSVDs on (b1*b2, binned window)
    p = b1 * b2
    t_bin = frame_range // temporal_avg_factor
    fl += sim_iters * 2 * p * t_bin * (1 + 10) * 2

    # block stage
    grid = BlockGrid(d1, d2, (b1, b2))
    nb = grid.n_blocks
    p_c = -(-b1 // spatial_avg_factor) * -(-b2 // spatial_avg_factor)
    t_b = t_bin * temporal_avg_factor
    mc = max_components
    per_block = (
        2 * p_c * t_bin * (mc + 10) * 2      # coarse sketch + QtX
        + 2 * p_c * (mc + 10) * t_b          # coarse temporal projection
        + 2 * p * t_b * mc                   # full-res spatial projection
        + 2 * p * mc * t_b * 2               # v_new + temporal projector
    )
    fl += nb * per_block

    # factorized SVD
    m = ranks["pre_reduction"]
    nnz = nb * p * mc + d * background_rank  # blocked-sparse U entries
    if rank_prune:
        cols = max(1, int(min(m, frame_range) * rank_prune_factor))
        fl += 2 * m * frame_range * cols     # random projection of V
    else:
        cols = frame_range
    r_cols = min(m, cols)
    fl += 2 * nnz * r_cols                   # Z = U @ right
    fl += 2 * d * r_cols * r_cols            # quad = Z^T Z
    fl += 10 * r_cols ** 3                   # eigh (rough)
    fl += 2 * m * r_cols * r_cols            # P = right @ eigvecs / s

    # streaming V regression over the FULL movie
    r_red = ranks["reduced"]
    fl += 2 * nnz * r_red                    # A = U @ P
    fl += 2 * d * r_red * t                  # chunked A~^T X
    # final reformat (Gram trick on (r_red, t))
    fl += 2 * r_red * r_red * t + 10 * r_red ** 3
    return fl


def _stage_stats(timing_dicts):
    """Per-stage median + IQR over the warm runs: {stage: {median_s, iqr_s}}."""
    stats = {}
    for d in timing_dicts:
        for k, v in d.items():
            stats.setdefault(k, []).append(float(v))
    out = {}
    for k, vals in stats.items():
        v = sorted(vals)
        n = len(v)
        med = v[n // 2] if n % 2 else 0.5 * (v[n // 2 - 1] + v[n // 2])
        q1 = v[max(0, int(0.25 * (n - 1)))]
        q3 = v[min(n - 1, int(round(0.75 * (n - 1))))]
        out[k] = {"median_s": round(med, 4), "iqr_s": round(q3 - q1, 4)}
    return out


def _prior_rounds():
    """Parse every committed BENCH_r*.json: [(round, value, big_mpf_s)]."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = []
    for p in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                doc = json.load(f)
        except Exception:
            continue
        parsed = doc.get("parsed") if isinstance(doc, dict) else None
        if parsed is None and isinstance(doc, dict) and "value" in doc:
            parsed = doc
        if not isinstance(parsed, dict) or "value" not in parsed:
            continue
        m = re.search(r"BENCH_r(\d+)", os.path.basename(p))
        big = (parsed.get("detail") or {}).get("leg_1024x1024x4096_u16") or {}
        rounds.append(
            (
                int(m.group(1)) if m else -1,
                float(parsed["value"]),
                float(big["mpf_s"]) if "mpf_s" in big else None,
            )
        )
    return rounds


def regression_gate(current_mpfs, warm_mpfs_samples, big_mpfs=None,
                    threshold=0.8):
    """Cross-round perf gate (VERDICT r4 #5): compare this run's headline
    numbers against the BEST prior committed BENCH_r*.json and flag >20%
    regressions, annotating whether the delta sits inside this run's own
    measured intra-day IQR (tunnel weather) or is a real slowdown."""
    rounds = _prior_rounds()
    regressed = []
    v = sorted(warm_mpfs_samples)
    n = len(v)
    q1 = v[max(0, int(0.25 * (n - 1)))]
    q3 = v[min(n - 1, int(round(0.75 * (n - 1))))]
    iqr = q3 - q1
    if rounds:
        best_round, best_val = max(
            ((r, val) for r, val, _ in rounds), key=lambda x: x[1]
        )
        if current_mpfs < threshold * best_val:
            regressed.append(
                {
                    "metric": "mpf_s_512",
                    "current": round(current_mpfs, 2),
                    "best_prior": round(best_val, 2),
                    "best_round": best_round,
                    "within_intraday_iqr": bool(
                        current_mpfs + iqr >= threshold * best_val
                    ),
                }
            )
        bigs = [(r, b) for r, _, b in rounds if b is not None]
        if big_mpfs is not None and bigs:
            br, bv = max(bigs, key=lambda x: x[1])
            if big_mpfs < threshold * bv:
                regressed.append(
                    {
                        "metric": "mpf_s_1024",
                        "current": round(big_mpfs, 2),
                        "best_prior": round(bv, 2),
                        "best_round": br,
                        # the big leg is best-of-3 with no per-leg spread
                        # recorded, so intra-day jitter can't be separated
                        # from a real slowdown here — flagged explicitly
                        # rather than silently omitted
                        "within_intraday_iqr": None,
                        "iqr_note": "single-leg sample; no spread measured",
                    }
                )
    return regressed, round(iqr, 2)


def _retry_run(movie, attempts=3, **kw):
    """The tunneled TPU is multi-tenant: identical programs OOM or fit
    run-to-run depending on co-tenants. Retry RESOURCE_EXHAUSTED a couple
    of times (with a pause for the neighbor's burst to drain) so a driver
    run on a congested chip still produces a number."""
    from localmd_tpu.utils import is_device_oom

    for i in range(attempts):
        try:
            return run_once(movie, **kw)
        except Exception as e:  # noqa: BLE001
            if not is_device_oom(e) or i == attempts - 1:
                raise
            print(f"# RESOURCE_EXHAUSTED (multi-tenant chip), retry {i + 1}",
                  file=sys.stderr)
            time.sleep(20)


def main():
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
        )
    except Exception:
        pass

    d1 = d2 = 512
    t = int(os.environ.get("BENCH_FRAMES", "2048"))
    movie = make_movie(d1, d2, t)

    _, cold = _retry_run(movie)
    warms = []
    stage_timings = []
    pmd = None
    for _ in range(5):
        try:
            pmd, w = _retry_run(movie)
        except Exception as e:  # noqa: BLE001
            # only tenancy OOMs are survivable; anything else (shape error,
            # NaN guard, driver fault) must fail the bench loudly — silently
            # shrinking the sample would mask real regressions
            from localmd_tpu.utils import is_device_oom

            if pmd is None or not is_device_oom(e):
                raise
            print("# warm run dropped: RESOURCE_EXHAUSTED persisted through "
                  "retries", file=sys.stderr)
            continue  # keep the warms already collected
        warms.append(w)
        stage_timings.append(dict(getattr(pmd, "pipeline_timings", {}) or {}))
    warm = min(warms)  # best-of-5: tunnel dispatch jitter dominates
    median = sorted(warms)[len(warms) // 2]

    # NOTE on precision: JAX's default matmul precision on TPU is already
    # one-pass bf16 MXU (Precision.DEFAULT) — verified on this chip:
    # default_matmul_precision('bfloat16') produces bit-identical results to
    # the ambient default, so the warm numbers above ARE the bf16-MXU
    # numbers. Pass matmul_precision='highest' to the pipeline for 6-pass
    # f32-accurate matmuls (slower; parity tests cover both).
    bf16_mpfs = None
    if os.environ.get("BENCH_HIGHEST"):
        # opt-in comparison leg: how much the f32-accurate path costs
        _, _ = run_once(movie, matmul_precision="highest")  # compile
        hi_warms = []
        for _ in range(3):
            _, w = run_once(movie, matmul_precision="highest")
            hi_warms.append(w)
        bf16_mpfs = d1 * d2 * t / min(hi_warms) / 1e6

    pixel_frames = d1 * d2 * t
    mpfs = pixel_frames / warm / 1e6
    baseline_per_chip = 125.0  # 1 Gpf/s north star on 8 chips

    # -- second leg: 1024^2 x 4096 (scaling beyond the 0.3 s regime) ---------
    # uint16 device-resident (8.6 GB — f32 would not fit v5e HBM beside its
    # own working set). OOM on the multi-tenant chip skips the leg rather
    # than failing the primary metric.
    big_leg = None
    if not os.environ.get("BENCH_SKIP_BIG"):
        del movie
        try:
            # frame_range=512 keeps the f32 init crop at 2.1 GB next to the
            # 8.6 GB device-resident movie (frame_range=1024's 4.3 GB crop
            # left no headroom for block-stage transients on a 16 GB chip)
            big = make_movie(1024, 1024, 4096, dtype="uint16")
            _, big_cold = _retry_run(
                big, attempts=2, blocks=(40, 40), frame_range=512,
                block_batch_size=64,
            )
            big_warms = []
            big_pmd = None
            for _ in range(3):
                big_pmd, w = _retry_run(
                    big, attempts=2, blocks=(40, 40), frame_range=512,
                    block_batch_size=64,
                )
                big_warms.append(w)
            big_warm = min(big_warms)
            big_leg = {
                "warm_s": round(big_warm, 2),
                "cold_s": round(big_cold, 2),
                "mpf_s": round(1024 * 1024 * 4096 / big_warm / 1e6, 1),
                "final_rank": big_pmd.rank,
            }
            del big, big_pmd
        except Exception as e:  # noqa: BLE001 - leg is best-effort
            big_leg = {"skipped": str(e)[:160]}

    flops = estimate_pipeline_flops(
        d1, d2, t, frame_range=1024, block=32, max_components=20,
        background_rank=15, temporal_avg_factor=10, spatial_avg_factor=2,
        sim_iters=250, rank_prune=True, rank_prune_factor=0.33,
        ranks=pmd.pipeline_ranks,
    )
    peak_tflops, chip_kind = _chip_peak_tflops()
    tflops = flops / warm / 1e12

    # -- cross-round regression gate (VERDICT r4 #5) -------------------------
    warm_mpfs_samples = [pixel_frames / w / 1e6 for w in warms]
    regressed, intraday_iqr = regression_gate(
        mpfs, warm_mpfs_samples,
        big_mpfs=(big_leg or {}).get("mpf_s"),
    )
    print(
        json.dumps(
            {
                "metric": "Mpixel-frames/sec/chip at 512x512 FOV",
                "value": round(mpfs, 2),
                "unit": "Mpf/s",
                "vs_baseline": round(mpfs / baseline_per_chip, 4),
                "detail": {
                    "warm_s": round(warm, 2),
                    "median_s": round(median, 2),
                    "cold_s": round(cold, 2),
                    "frames": t,
                    "final_rank": pmd.rank,
                    "model_tflop": round(flops / 1e12, 3),
                    "achieved_tflops": round(tflops, 3),
                    "mfu_vs_bf16_peak": round(tflops / peak_tflops, 5),
                    "chip": chip_kind,
                    "peak_bf16_tflops": peak_tflops,
                    "stages": _stage_stats(stage_timings),
                    "warm_mpfs_iqr": intraday_iqr,
                    "regressed": regressed,
                    **(
                        {"leg_1024x1024x4096_u16": big_leg}
                        if big_leg is not None
                        else {}
                    ),
                    **(
                        {"highest_precision_mpf_s": round(bf16_mpfs, 2)}
                        if bf16_mpfs is not None
                        else {}
                    ),
                    "note": (
                        "matmul-FLOP model (~±20%); the pipeline is "
                        "bandwidth/latency-dominated at this scale, not "
                        "MXU-bound — Mpf/s is the metric of record"
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
