#!/usr/bin/env python
"""Scan-differential dissection of the non-kernel ("rest") step cost.

Four loop-carried on-device scans at the bench workload, each adding one
phase, all advancing params through Adam so nothing is loop-invariant:

  adam            zero grads (+eps of params)                  -> floor
  counts          + counts-only binning (bbox + sort + runs)
  ids             + padded id-matrix build (the per-tile gather)
  table (=rest)   + the resident packed-table build

Differences isolate the binning sort, the ids build, and the table pack.
Compare against the full fit scan (kernel included) for the kernel share.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default="squirrel_cls_mini.jpg")
    ap.add_argument("--splats", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    import functools

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

    ref = load_asset(args.image)
    h, w = ref.shape[:2]
    cfg = tl.tune_tile_height(SplatConfig(
        width=w, height=h, n_splats=args.splats, binning="resident"))
    state0 = init_train_state(cfg)
    cfg = tl.tune_tile_capacity(state0.params, cfg)
    k = rp._max_per_tile(cfg)
    refc = rp.pad_ref_chw(jnp.asarray(ref), cfg)
    print(f"config: {w}x{h}, {args.splats} splats, K={k}, "
          f"cap={cfg.max_tiles_per_splat}, tiles="
          f"{cfg.n_tiles_y}x{cfg.n_tiles_x}", flush=True)

    def make_scan(extra):
        """extra(params) -> traced f32 scalar kept live in the grads."""

        @functools.partial(jax.jit, static_argnames=("n",))
        def scan(state, n):
            def body(st, _):
                eps = extra(st.params) * jnp.float32(1e-30)
                grads = jax.tree.map(jnp.zeros_like, st.params)
                grads = grads.replace(pos=grads.pos + eps)
                params, opt = adam_update(st.params, grads, st.opt, cfg)
                return TrainState(params=params, opt=opt), jnp.float32(0)

            return jax.lax.scan(body, state, None, length=n)[0]

        return scan

    def t_of(fn, *a):
        out = fn(*a)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        out = fn(*a)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        return (time.perf_counter() - t0) / args.iters

    variants = {
        "adam": make_scan(lambda p: jnp.sum(p.opacity)),
        "counts": make_scan(lambda p: jnp.sum(
            tl.bin_splats(p, cfg, 1, counts_only=True).astype(jnp.float32))),
        "ids": make_scan(lambda p: jnp.sum(
            tl.bin_splats(p, cfg, k, ids_only=True).ids.astype(jnp.float32))),
        "table": make_scan(lambda p: jnp.sum(
            tl.bin_splats(p, cfg, k, ids_only=True).ids.astype(jnp.float32))
            + jnp.sum(rpr.resident_table(p, cfg))),
    }
    times = {}
    for name, fn in variants.items():
        times[name] = t_of(fn, state0, args.iters)
        print(f"{name:8s} scan: {times[name]*1e3:7.3f} ms/iter", flush=True)

    fit_k = make_fit_scan_fused(cfg)
    t_full = t_of(lambda s, n: fit_k(s, refc, n)[0], state0, args.iters)
    print(f"full     scan: {t_full*1e3:7.3f} ms/iter", flush=True)
    print("-- deltas --", flush=True)
    print(f"binning sort+counts: {(times['counts']-times['adam'])*1e3:7.3f} ms",
          flush=True)
    print(f"ids-matrix build:    {(times['ids']-times['counts'])*1e3:7.3f} ms",
          flush=True)
    print(f"table pack:          {(times['table']-times['ids'])*1e3:7.3f} ms",
          flush=True)
    print(f"kernel (+mse etc.):  {(t_full-times['table'])*1e3:7.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
