#!/usr/bin/env python
"""A/B the backward G-cache (cfg.alpha_cache) on hardware.

Runs the production mini workload (bench.py config) twice in one process
-- alpha_cache True vs False -- so tunnel noise cancels. Prints ms/iter
for each and the delta.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import gs2d_tpu

gs2d_tpu.enable_compilation_cache()

from gs2d_tpu.config import SplatConfig
from gs2d_tpu.io.image import load_asset
from gs2d_tpu.ops import render_pallas, tiles as tl
from gs2d_tpu.train.loop import init_train_state, make_fit_scan_fused


def run(cfg, refj, iters=200, reps=2):
    state = init_train_state(cfg)
    fit_k = make_fit_scan_fused(cfg)
    t_c = time.perf_counter()
    state, auxes = fit_k(state, refj, iters)  # warmup/compile
    float(auxes.mse[-1])
    compile_s = time.perf_counter() - t_c
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state2, auxes = fit_k(state, refj, iters)
        float(auxes.mse[-1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, compile_s, float(auxes.mse[-1])


def main():
    if len(sys.argv) > 1:
        render_pallas.GCACHE_BUDGET_BYTES = int(sys.argv[1])
    ref = load_asset("squirrel_cls_mini.jpg")
    h, w = ref.shape[:2]
    base = SplatConfig(width=w, height=h, n_splats=1024, tile_h=32,
                       binning="resident", rebin_margin=2.0)
    base = tl.tune_tile_capacity(init_train_state(base).params, base)
    refj = render_pallas.pad_ref_chw(jnp.asarray(ref), base)
    print(f"tile capacity K={base.max_splats_per_tile}, "
          f"gcache budget ok={render_pallas._use_gcache(base, base.max_splats_per_tile)}",
          flush=True)
    for ac in (True, False):
        cfg = base.replace(alpha_cache=ac)
        dt, cs, mse = run(cfg, refj)
        print(f"alpha_cache={ac}: {dt*1e3:.3f} ms/iter ({1/dt:.1f} it/s), "
              f"compile {cs:.1f}s, mse@200 {mse:.4f}", flush=True)


if __name__ == "__main__":
    main()
