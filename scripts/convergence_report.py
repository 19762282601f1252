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
            SplatConfig(width=w, height=h, n_splats=args.splats))
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

    state = init_train_state(cfg)
    t0 = time.perf_counter()
    hit_iter, hit_time = None, None
    done = 0
    final_mse = None
    while done < args.iters:
        n = min(args.block, args.iters - done)
        state, aux = fit_k(state, refj, n)
        mses = jax.device_get(aux.mse)
        t_block = time.perf_counter() - t0
        if hit_iter is None:
            import numpy as np

            hits = np.nonzero(mses <= args.target_mse)[0]
            if hits.size:
                hit_iter = done + int(hits[0]) + 1
                hit_time = t_block  # end-of-block upper bound
        done += n
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
