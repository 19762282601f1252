#!/usr/bin/env python
"""Convergence report: iterations and wall time to reach the C++ baseline's
MSE trajectory on the reference workload (the BASELINE.json "iters/s to ref
PSNR" metric).

Runs the PRODUCTION shape: tuned tile height/capacities, auto binning
(resident at this scale), iterations in on-device ``lax.scan`` blocks. The
per-iteration MSE history comes from the stacked scan aux, so the hit
iteration is exact; the hit time is the wall time at the end of the block
that reached the target (an upper bound within one block).

Usage: python scripts/convergence_report.py [--iters 500] [--splats 1024]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--splats", type=int, default=1024)
    ap.add_argument("--block", type=int, default=25,
                    help="scan block size (timing granularity)")
    ap.add_argument("--target-mse", type=float, default=109.18,
                    help="C++ baseline MSE-255 at iter 200 (BASELINE.md)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import gs2d_tpu
    gs2d_tpu.enable_compilation_cache()
    from gs2d_tpu.config import SplatConfig
    from gs2d_tpu.io.image import load_asset
    from gs2d_tpu.ops import render_pallas as rp
    from gs2d_tpu.ops import tiles as tl
    from gs2d_tpu.train.loop import (init_train_state, make_fit_scan,
                                     make_fit_scan_fused)
    from gs2d_tpu.train.metrics import psnr_from_mse

    ref = load_asset("squirrel_cls_mini.jpg")
    h, w = ref.shape[:2]
    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        cfg = tl.tune_tile_height(
            SplatConfig(width=w, height=h, n_splats=args.splats,
                        rebin_margin=2.0))
        cfg = tl.tune_tile_capacity(init_train_state(cfg).params, cfg)
        refj = rp.pad_ref_chw(jnp.asarray(ref), cfg)
        fit_k = make_fit_scan_fused(cfg)
    else:
        cfg = SplatConfig(width=w, height=h, n_splats=args.splats)
        refj = jnp.asarray(ref)
        fit_k = make_fit_scan(cfg)

    # Compile barrier (state is re-inited for the timed run).
    s0 = init_train_state(cfg)
    _, aux = fit_k(s0, refj, args.block)
    float(aux.mse[-1])

    import numpy as np

    # Dispatch blocks back-to-back (device executes them in order; the scan
    # carry chains them) and fetch each block's MSE history one block behind,
    # so the ~30 ms tunnel fetch RTT overlaps the next block's execution
    # instead of serializing with it. The hit time remains an end-of-block
    # upper bound: the wall clock when the block containing the hit has been
    # fetched (i.e. provably complete on device).
    state = init_train_state(cfg)
    # Materialize the initial state BEFORE the clock: the C++ baseline
    # timer also starts its clock after init_pop and allocations
    # (oracle/baseline_timer.cpp:266), so the timed region covers exactly
    # the optimization loop on both sides.
    float(jnp.ravel(state.params.opacity)[0])
    t0 = time.perf_counter()
    hit_iter, hit_time = None, None
    final_mse = None
    blocks = []  # (start_iter, n, aux) pending fetch
    done = 0
    while done < args.iters:
        n = min(args.block, args.iters - done)
        state, aux = fit_k(state, refj, n)
        blocks.append((done, n, aux))
        done += n
        while len(blocks) > 1:  # keep one block in flight
            start, bn, baux = blocks.pop(0)
            mses = jax.device_get(baux.mse)
            t_block = time.perf_counter() - t0
            if hit_iter is None:
                hits = np.nonzero(mses <= args.target_mse)[0]
                if hits.size:
                    hit_iter = start + int(hits[0]) + 1
                    hit_time = t_block
            final_mse = float(mses[-1])
    for start, bn, baux in blocks:
        mses = jax.device_get(baux.mse)
        t_block = time.perf_counter() - t0
        if hit_iter is None:
            hits = np.nonzero(mses <= args.target_mse)[0]
            if hits.size:
                hit_iter = start + int(hits[0]) + 1
                hit_time = t_block
        final_mse = float(mses[-1])
    total = time.perf_counter() - t0
    print(json.dumps({
        "workload": f"squirrel_cls_mini {w}x{h}, {args.splats} splats "
                    f"(production scan path, binning auto)",
        "target_mse255": args.target_mse,
        "reached_at_iter": hit_iter,
        "reached_at_seconds": round(hit_time, 3) if hit_time else None,
        "cpp_seconds_to_target": round(200 * 0.02516, 3),
        "final_mse255": round(final_mse, 2),
        "final_psnr_db": round(float(psnr_from_mse(jnp.float32(final_mse))), 2),
        "iters": args.iters,
        "seconds_total": round(total, 3),
    }))


if __name__ == "__main__":
    main()
