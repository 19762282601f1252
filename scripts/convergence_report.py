#!/usr/bin/env python
"""Convergence report: iterations and wall time to reach the C++ baseline's
MSE trajectory on the reference workload (the BASELINE.json "iters/s to ref
PSNR" metric).

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
    from gs2d_tpu.train.loop import (init_train_state, make_train_step,
                                     make_train_step_fused)
    from gs2d_tpu.train.metrics import psnr_from_mse

    ref = load_asset("squirrel_cls_mini.jpg")
    h, w = ref.shape[:2]
    cfg = SplatConfig(width=w, height=h, n_splats=args.splats,
                      max_splats_per_tile=256)
    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        refj = rp.pad_ref_chw(jnp.asarray(ref), cfg)
        step = make_train_step_fused(cfg)
    else:
        refj = jnp.asarray(ref)
        step = make_train_step(cfg)

    state = init_train_state(cfg)
    state, aux = step(state, refj)
    float(aux.mse)  # compile barrier

    state = init_train_state(cfg)
    t0 = time.perf_counter()
    hit_iter, hit_time = None, None
    for it in range(args.iters):
        state, aux = step(state, refj)
        if hit_iter is None and (it + 1) % 10 == 0:
            if float(aux.mse) <= args.target_mse:
                hit_iter, hit_time = it + 1, time.perf_counter() - t0
    final_mse = float(aux.mse)
    total = time.perf_counter() - t0
    print(json.dumps({
        "workload": f"squirrel_cls_mini {w}x{h}, {args.splats} splats",
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
