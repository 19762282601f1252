#!/usr/bin/env python
"""Scan-differential dissection of the fused resident kernel itself.

Extends scripts/dissect_rest.py one level down: three loop-carried
on-device scans at the bench workload (eager per-step binning so the rows
line up with dissect_rest), differenced to split the "kernel (+mse etc.)"
phase into the forward pass vs the backward pass (+ one-hot MXU gradient
expansion + unpack):

  glue     binning + table + adam + mse-on-fake-color           -> no kernel
  fwd      + forward_resident (modular forward kernel only)
  full     the production fused step (make_fit_scan_fused)

Deltas: fwd - glue = forward kernel; full - fwd = backward replay +
expansion + grads unpack (the fused kernel's extra work over the modular
forward; the fused forward also stores the G-cache, charged here).
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default="squirrel_cls_mini.jpg")
    ap.add_argument("--splats", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import gs2d_tpu
    gs2d_tpu.enable_compilation_cache()
    from gs2d_tpu.config import SplatConfig
    from gs2d_tpu.io.image import load_asset
    from gs2d_tpu.ops import render_pallas as rp
    from gs2d_tpu.ops import render_pallas_resident as rpr
    from gs2d_tpu.ops import tiles as tl
    from gs2d_tpu.train.adam import adam_update
    from gs2d_tpu.train.loop import (TrainState, init_train_state,
                                     make_fit_scan_fused)
    from gs2d_tpu.train.metrics import mse_255

    ref = load_asset(args.image)
    h, w = ref.shape[:2]
    cfg = tl.tune_tile_height(SplatConfig(
        width=w, height=h, n_splats=args.splats, binning="resident"))
    state0 = init_train_state(cfg)
    cfg = tl.tune_tile_capacity(state0.params, cfg)
    k = rp._max_per_tile(cfg)
    refc = rp.pad_ref_chw(jnp.asarray(ref), cfg)
    ref_crop = jnp.transpose(refc[0], (1, 2, 0))[: cfg.height, : cfg.width]
    print(f"config: {w}x{h}, {args.splats} splats, K={k}, "
          f"gcache={rp._use_gcache(cfg, k)}", flush=True)

    import functools

    def make_scan(render):
        """render(params, binning, table) -> (H, W, 3) color (or fake)."""

        @functools.partial(jax.jit, static_argnames=("n",))
        def scan(state, n):
            def body(st, _):
                binning = tl.bin_splats(st.params, cfg, k, ids_only=True)
                table = rpr.resident_table(st.params, cfg)
                color = render(st.params, binning, table)
                mse = mse_255(color, ref_crop)
                grads = jax.tree.map(jnp.zeros_like, st.params)
                grads = grads.replace(
                    pos=grads.pos + mse * jnp.float32(1e-30))
                params, opt = adam_update(st.params, grads, st.opt, cfg)
                return TrainState(params=params, opt=opt), mse

            return jax.lax.scan(body, state, None, length=n)[0]

        return scan

    def t_of(fn, *a):
        out = fn(*a)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        out = fn(*a)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        return (time.perf_counter() - t0) / args.iters

    def fake_color(params, binning, table):
        # Consume binning + table so nothing dead-codes; no kernel.
        v = (jnp.sum(table) + jnp.sum(binning.ids.astype(jnp.float32))
             ) * jnp.float32(1e-30)
        return jnp.zeros((cfg.height, cfg.width, 3), jnp.float32) + v

    def fwd_color(params, binning, table):
        color, _ = rpr.forward_resident(binning, table, cfg.n_splats, cfg)
        return color

    times = {}
    for name, render in (("glue", fake_color), ("fwd", fwd_color)):
        times[name] = t_of(make_scan(render), state0, args.iters)
        print(f"{name:5s} scan: {times[name]*1e3:7.3f} ms/iter", flush=True)

    fit_k = make_fit_scan_fused(cfg)
    t_full = t_of(lambda s, n: fit_k(s, refc, n)[0], state0, args.iters)
    print(f"full  scan: {t_full*1e3:7.3f} ms/iter", flush=True)
    print("-- deltas --", flush=True)
    print(f"forward kernel:          {(times['fwd']-times['glue'])*1e3:7.3f} ms",
          flush=True)
    print(f"bwd+expansion (+gcache): {(t_full-times['fwd'])*1e3:7.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
