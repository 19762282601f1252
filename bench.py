#!/usr/bin/env python
"""Round benchmark: training throughput at the reference default workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: squirrel_cls_mini.jpg (268x213) fit with 1024 splats -- the
reference's default configuration (/root/reference/main.cpp:257,271).
Baseline denominator: 39.7 iters/s, the C++ re-timing measured with
oracle/baseline_timer.cpp on this machine (see BASELINE.md).

BENCH CONTRACT (frozen 2026-08-20, round 5; see BASELINE.md):
the headline is the PIPELINED-SCAN number -- 5 back-to-back 200-iter
on-device lax.scan segments of the production fit, ONE scalar fetch at
the end, so the tunnel's fixed ~30-35 ms dispatch+fetch RTT amortizes
over 1000 iterations instead of being charged to 200 (an EMPTY 200-iter
scan times at 0.146 ms/iter on this runtime -- the RTT is real but is
not per-iteration work; scripts/scan_floor_probe.py). Rounds 1-3
charged one full RTT per 200-iter block; the single-block number is
printed alongside on stderr for continuity with BENCH_r01..r03.
"""

import json
import sys
import time

CPP_BASELINE_ITERS_PER_S = 39.7  # BASELINE.md, measured 2026-08-17


def _tpu_alive(timeout_s: int = 180) -> bool:
    """Probe the tunneled TPU in a subprocess: a wedged terminal makes
    jax.devices() hang forever (seen after an aborted huge-kernel compile,
    CLAUDE.md), which would otherwise hang the whole benchmark."""
    import subprocess

    try:
        return subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import os

    if not _tpu_alive():
        print("WARNING: TPU terminal unreachable; falling back to CPU "
              "(timings are NOT the TPU headline)", file=sys.stderr)
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import gs2d_tpu
    gs2d_tpu.enable_compilation_cache()
    from gs2d_tpu.config import SplatConfig
    from gs2d_tpu.io.image import load_asset
    from gs2d_tpu.ops import render_pallas
    from gs2d_tpu.train.loop import (init_train_state, make_fit_scan_fused,
                                     make_train_step)

    ref = load_asset("squirrel_cls_mini.jpg")
    h, w = ref.shape[:2]
    # Production small-N shape (matches the CLI auto path): 32-row tiles
    # (grid-dispatch-bound small image; measured sweep in BASELINE.md),
    # resident binning (ids-only binning + whole-table SMEM kernel, no
    # pregather/scatter -- 931 vs 755 it/s dense, BASELINE.md round 2),
    # capacities tuned from the measured counts.
    from gs2d_tpu.ops import tiles as tl

    # rebin_margin=2: lazy rebinning (bin with 2px of footprint slack, reuse
    # ids across scan steps until a splat's exact footprint escapes; exact
    # per-step tripwire, identical MSE trajectory). Measured on-chip
    # 2026-08-18: 0.92 vs 1.23 ms/iter per-step-rebin, 27/200 rebins.
    cfg = SplatConfig(width=w, height=h, n_splats=1024, tile_h=32,
                      binning="resident", rebin_margin=2.0)
    cfg = tl.tune_tile_capacity(init_train_state(cfg).params, cfg)

    on_tpu = jax.default_backend() not in ("cpu",)
    state = init_train_state(cfg)
    # NOTE: completion is forced by fetching a scalar -- on the tunneled TPU
    # runtime block_until_ready alone does not reliably wait.
    if on_tpu:
        # Production shape: iterations run as one on-device lax.scan program
        # (make_fit_scan_fused), so host dispatch and tunnel latency are out
        # of the measured loop entirely.
        refj = render_pallas.pad_ref_chw(jnp.asarray(ref), cfg)
        # The tunneled runtime charges a FIXED ~30-35 ms dispatch+fetch RTT
        # per synchronous call (CLAUDE.md latency profile) -- measured
        # directly: an EMPTY 200-iter lax.scan times at 0.146 ms/iter, i.e.
        # the whole "floor" is one round trip, not per-iteration work. The
        # per-iteration metric must not include it, so the timed region
        # pipelines `reps` back-to-back 200-iter scan segments (continuing
        # the same fit trajectory; queue depth 5 is far below the ~100 where
        # transient collapses were seen) and fetches ONE scalar at the end:
        # overhead amortizes over reps*iters instead of iters.
        iters, reps = 200, 5
        fit_k = make_fit_scan_fused(cfg)
        state, auxes = fit_k(state, refj, iters)  # warmup/compile
        float(auxes.mse[-1])
        # Continuity number (rounds 1-3 methodology): ONE 200-iter block
        # with its dispatch+fetch RTT charged to the block.
        t0 = time.perf_counter()
        state, auxes = fit_k(state, refj, iters)
        float(auxes.mse[-1])
        dt_single = (time.perf_counter() - t0) / iters
        t0 = time.perf_counter()
        for _ in range(reps):
            state, auxes = fit_k(state, refj, iters)
        float(auxes.mse[-1])
        dt = (time.perf_counter() - t0) / (iters * reps)
        print(f"single-block continuity number (r1-r3 methodology): "
              f"{1.0 / dt_single:.1f} it/s ({dt_single * 1e3:.3f} ms/iter)",
              file=sys.stderr)
    else:
        refj = jnp.asarray(ref)
        step = make_train_step(cfg)
        state, aux = step(state, refj)
        float(aux.mse)
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            state, aux = step(state, refj)
        float(aux.mse)
        dt = (time.perf_counter() - t0) / iters

    iters_per_s = 1.0 / dt
    unit = "iterations/s (fwd+bwd+adam, 268x213, 1024 splats)"
    if not on_tpu:
        unit += " [CPU FALLBACK - TPU terminal unreachable; NOT the headline]"
    print(json.dumps({
        "metric": "train_iters_per_s_mini_1024_splats",
        "value": round(iters_per_s, 3),
        "unit": unit,
        "vs_baseline": round(iters_per_s / CPP_BASELINE_ITERS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
