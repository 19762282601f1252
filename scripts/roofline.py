#!/usr/bin/env python
"""Speed-of-light accounting for the splat kernels on the current chip.

Methodology (all ceilings MEASURED on this chip, not copied from datasheets):

1. HBM bandwidth ceiling: time ``y = x + 1`` over a large f32 array
   (reads + writes = 2 x size).
2. VPU f32 ceiling: a synthetic Pallas kernel of independent FMA chains on
   (8, 128) registers -- the same shape the splat kernels use -- with
   enough ILP to saturate issue. Reports FMA/s (1 FMA = 2 FLOP).
3. For each workload: run binning + kernels, convert measured time into
   - achieved pair-steps/s (one pair-step = one splat evaluated on one
     8x128 pixel tile, the kernel's unit of work),
   - achieved VPU utilization = pair-steps/s * ops-per-pair-step
     (hand-counted below) / measured VPU ceiling,
   - achieved HBM GB/s over the arrays actually moved vs the copy ceiling.

Hand op-count per pair-step (f32 vector ops on (8,128), from
render_pallas._splat_terms/_fwd_one/_bwd_splat_step, post the round-4
cotangent-weighted (ga) replay + MOMENT-FORM refactors and the round-5
SEPARABLE reduction (_moment_reduce: 3 z-family sublane chains + lane
monomials on the reduced rows instead of 9 full plane reduces; the
per-splat gradient combinations run outside the kernel in
moments_to_grads):
  forward   ~40  (coverage 22, alpha/exp 8, composite 10)
  backward  ~64  (re-derive coverage+alpha 30, ga replay + dL/dalpha 14,
                  2 moment + 3 color plane products 5, 6 sublane reduces
                  ~10, row monomials ~1, one-hot accumulate ~4/lane-block)
  backward (G-cache replay, _bwd_splat_step_cached: fused/resident
  kernels when K fits GCACHE_BUDGET_BYTES) ~36 -- no re-derivation,
  no mask ops, no geometry-field SMEM reads, no vx plane at all.
Pass --cached to model the G-cache backward instead of the re-deriving
one. Results land in BASELINE.md.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(jnp.asarray(x).ravel()[:1]))


def measure_hbm_bw():
    """GB/s of a big elementwise pass (read + write).

    The passes iterate in an on-device ``lax.scan`` (one dispatch): a host
    loop of per-call dispatches bottoms out at the tunnel's ~1.8 ms/iter
    pipeline floor and under-reports bandwidth ~2x.
    """
    import jax
    import jax.numpy as jnp

    n = 256 * 1024 * 1024 // 4  # 256 MB f32
    k = 32
    x = jnp.zeros((n,), jnp.float32)

    @jax.jit
    def loop(a):
        return jax.lax.scan(
            lambda c, _: (c + jnp.float32(1.0), jnp.float32(0)),
            a, None, length=k)[0]

    y = loop(x)
    sync(y)
    t0 = time.perf_counter()
    y = loop(y)
    sync(y)
    dt = (time.perf_counter() - t0) / k
    return 2 * n * 4 / dt / 1e9


def measure_vpu_fma():
    """Measured f32 FMA/s ceiling with an ILP-heavy Pallas kernel.

    Each accumulator chain is serial (FMA latency-bound), so the chain
    count sets the ILP; sweep it and take the best rate as the ceiling.
    """
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    INNER = 256
    GRID = 4096

    def make(lanes):
        def kernel(out_ref):
            accs = [jnp.full((8, 128), jnp.float32(1.0 + i))
                    for i in range(lanes)]
            c = jnp.float32(1.0000001)

            def body(_, accs):
                return tuple(a * c + jnp.float32(1e-9) for a in accs)

            accs = jax.lax.fori_loop(0, INNER, body, tuple(accs))
            out_ref[...] = sum(accs)

        return jax.jit(pl.pallas_call(
            kernel,
            grid=(GRID,),
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ))

    best = 0.0
    for lanes in (8, 16, 32):
        f = make(lanes)
        y = f()
        sync(y)
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            y = f()
        sync(y)
        dt = (time.perf_counter() - t0) / iters
        rate = GRID * INNER * lanes * 8 * 128 / dt
        print(f"  vpu chains={lanes}: {rate/1e12:.3f} TFMA/s", flush=True)
        best = max(best, rate)
    return best


FWD_OPS = 40   # vector ops per pair-step, hand-counted (docstring)
BWD_OPS = 64   # re-deriving backward (moment form + separable reduce, r5)
BWD_OPS_CACHED = 36  # G-cache backward (_bwd_splat_step_cached)


def workload_scan_diff(name, w, h, n_splats, binning, image=None, iters=60):
    """Tunnel-free kernel timing for small workloads.

    A host loop of per-call dispatches bottoms out at the tunnel's pipeline
    floor (~2-3 ms/call at shallow queue depth), which swamps sub-5 ms
    kernels -- the round-2 per-call numbers for mini/10k were mostly tunnel.
    Instead run two genuinely loop-carried on-device ``lax.scan`` programs:

      t_full  = the production fused fit scan (binning + kernel + adam +
                metrics per iteration),
      t_rest  = the same scan with the rasterization kernel excised
                (binning + adam on ~zero grads; the binning result feeds the
                grads through a 1e-30-scaled term so XLA cannot dead-code or
                hoist it),

    and report kernel_ms = t_full - t_rest. Both scans advance params each
    iteration, so nothing is loop-invariant. Pair counts drift as the fit
    progresses; we average the binned counts at the initial and final states.
    """
    import jax
    import jax.numpy as jnp

    from gs2d_tpu.config import SplatConfig
    from gs2d_tpu.io.image import load_asset, synthetic_target
    from gs2d_tpu.ops import render_pallas as rp
    from gs2d_tpu.ops import render_pallas_flat as rpf
    from gs2d_tpu.ops import tiles as tl
    from gs2d_tpu.ops import tiles_flat as tlf
    from gs2d_tpu.train.adam import adam_update
    from gs2d_tpu.train.loop import (TrainState, init_train_state,
                                     make_fit_scan_fused)

    ref = load_asset(image) if image else synthetic_target(h, w)
    cfg = tl.tune_tile_height(
        SplatConfig(width=w, height=h, n_splats=n_splats, binning=binning))
    state0 = init_train_state(cfg)
    if binning == "flat":
        cfg = rpf.tune_flat_config(state0.params, cfg)

        def bin_fn(p):
            return tlf.bin_splats_flat(p, cfg, cfg.flat_capacity,
                                       kc=cfg.flat_chunk,
                                       max_chunks=cfg.flat_max_chunks)
    else:
        cfg = tl.tune_tile_capacity(state0.params, cfg)
        k = rp._max_per_tile(cfg)
        ids_only = rpf.resolve_binning(cfg) == "resident"

        def bin_fn(p):
            return tl.bin_splats(p, cfg, k, ids_only=ids_only)

    refc = rp.pad_ref_chw(jnp.asarray(ref), cfg)

    import functools

    @functools.partial(jax.jit, static_argnames=("n_iters",))
    def rest_scan(state, n_iters):
        def body(st, _):
            b = bin_fn(st.params)
            # Keep the binning live and the loop carried: fold an O(1e-30)
            # function of its counts into otherwise-zero gradients.
            eps = jnp.sum(b.count.astype(jnp.float32)) * jnp.float32(1e-30)
            grads = jax.tree.map(jnp.zeros_like, st.params)
            grads = grads.replace(pos=grads.pos + eps)
            params, opt = adam_update(st.params, grads, st.opt, cfg)
            return TrainState(params=params, opt=opt), jnp.float32(0)

        return jax.lax.scan(body, state, None, length=n_iters)[0]

    fit_k = make_fit_scan_fused(cfg)

    def run(fn, *args):
        out = fn(*args)
        sync(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        out = fn(*args)
        sync(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / iters, out

    t_full, (state_end, _) = run(fit_k, state0, refc, iters)
    t_rest, _ = run(rest_scan, state0, iters)
    kernel = t_full - t_rest

    counts0 = jax.jit(lambda p: jnp.sum(bin_fn(p).count))(state0.params)
    counts1 = jax.jit(lambda p: jnp.sum(bin_fn(p).count))(state_end.params)
    pair_steps = 0.5 * (int(counts0) + int(counts1))
    # Fused non-chunked dense/resident kernels replay through the G-cache
    # when the scratch fits the budget (render_pallas._use_gcache).
    bwd = BWD_OPS
    if binning != "flat" and (binning == "resident" or k <= 256) \
            and rp._use_gcache(cfg, k):
        bwd = BWD_OPS_CACHED
    ops = pair_steps * (FWD_OPS + bwd) * cfg.tile_h * 128
    return {
        "workload": name,
        "pair_steps": int(pair_steps),
        "full_ms": t_full * 1e3,
        "rest_ms": t_rest * 1e3,
        "kernel_ms": kernel * 1e3,
        "pair_steps_per_s": pair_steps / kernel,
        "vpu_ops_per_s": ops / kernel,
    }


def workload(name, w, h, n_splats, binning, image=None, iters=10):
    import jax
    import jax.numpy as jnp

    from gs2d_tpu.config import SplatConfig
    from gs2d_tpu.io.image import load_asset, synthetic_target
    from gs2d_tpu.ops import render_pallas as rp
    from gs2d_tpu.ops import render_pallas_flat as rpf
    from gs2d_tpu.ops import tiles as tl
    from gs2d_tpu.ops import tiles_flat as tlf
    from gs2d_tpu.train.loop import init_train_state

    ref = load_asset(image) if image else synthetic_target(h, w)
    cfg = tl.tune_tile_height(
        SplatConfig(width=w, height=h, n_splats=n_splats, binning=binning))
    state = init_train_state(cfg)
    if binning == "flat":
        cfg = rpf.tune_flat_config(state.params, cfg)
        bin_fn = jax.jit(lambda p: tlf.bin_splats_flat(
            p, cfg, cfg.flat_capacity, kc=cfg.flat_chunk,
            max_chunks=cfg.flat_max_chunks))
    else:
        cfg = tl.tune_tile_capacity(state.params, cfg)
        k = rp._max_per_tile(cfg)
        bin_fn = jax.jit(lambda p: tl.bin_splats(p, cfg, k))
    refc = rp.pad_ref_chw(jnp.asarray(ref), cfg)
    b = bin_fn(state.params)
    pair_steps = int(jnp.sum(
        (b.count + cfg.tile_h * 0) if binning != "flat" else b.count))
    # For the dense path count = per-tile live entries too.
    if binning == "flat":
        kern = jax.jit(lambda bb: rpf.l2_render_and_grads_flat(
            bb, refc, cfg.n_splats, cfg, cfg.flat_chunk,
            cfg.flat_max_chunks, params=state.params))
        rows_bytes = (b.rows.size + b.ids.size) * 4 \
            + b.rows.size * 4  # params read + grads written back
    else:
        kern = jax.jit(lambda bb: rp.l2_render_and_grads(
            bb, refc, cfg.n_splats, cfg, state.params))
        kk = b.ids.shape[1]
        n_tiles = b.ids.shape[0]
        rows_bytes = n_tiles * kk * tl.N_FIELDS * 4 * 2  # params + grads

    out = kern(b)
    sync(out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = kern(b)
    sync(out[0])
    dt = (time.perf_counter() - t0) / iters

    ops = pair_steps * (FWD_OPS + BWD_OPS) * cfg.tile_h * 128  # lane ops
    return {
        "workload": name,
        "pair_steps": pair_steps,
        "kernel_ms": dt * 1e3,
        "pair_steps_per_s": pair_steps / dt,
        "vpu_ops_per_s": ops / dt,
        "hbm_bytes": rows_bytes,
        "hbm_gbps": rows_bytes / dt / 1e9,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-ceilings", action="store_true")
    args = ap.parse_args()

    import gs2d_tpu
    gs2d_tpu.enable_compilation_cache()

    if not args.skip_ceilings:
        bw = measure_hbm_bw()
        print(f"HBM elementwise BW ceiling: {bw:8.1f} GB/s", flush=True)
        vpu = measure_vpu_fma()
        print(f"VPU f32 FMA ceiling:        {vpu/1e12:8.3f} TFMA/s "
              f"({2*vpu/1e12:.3f} TFLOP/s)", flush=True)
    else:
        bw = vpu = None

    # Small workloads (kernel < ~20 ms): per-call timing is tunnel-floor
    # polluted; use the scan-differential measurement. Large ones: direct.
    scan_cases = [
        ("mini 1k resident", 268, 213, 1024, "resident",
         "squirrel_cls_mini.jpg"),
        ("mini 1k dense", 268, 213, 1024, "dense", "squirrel_cls_mini.jpg"),
        ("10k", 535, 426, 10240, "dense", "squirrel_cls.jpg"),
        ("10k flat", 535, 426, 10240, "flat", "squirrel_cls.jpg"),
    ]
    for name, w, h, n, binning, image in scan_cases:
        r = workload_scan_diff(name, w, h, n, binning, image)
        line = (f"{name:18s} pair-steps {r['pair_steps']:>9d}  "
                f"kernel {r['kernel_ms']:7.2f} ms "
                f"(scan {r['full_ms']:.2f} - rest {r['rest_ms']:.2f})  "
                f"{r['pair_steps_per_s']/1e6:6.1f} M pair-steps/s")
        if vpu:
            util = r["vpu_ops_per_s"] / (vpu)
            line += f"  VPU ~{100*util:5.1f}% of measured ceiling"
        print(line, flush=True)
    cases = [
        ("1080p 100k flat", 1920, 1080, 102400, "flat", None),
    ]
    for name, w, h, n, binning, image in cases:
        r = workload(name, w, h, n, binning, image)
        line = (f"{name:18s} pair-steps {r['pair_steps']:>9d}  "
                f"kernel {r['kernel_ms']:7.2f} ms  "
                f"{r['pair_steps_per_s']/1e6:6.1f} M pair-steps/s  "
                f"param-rows {r['hbm_gbps']:6.1f} GB/s")
        if vpu:
            util = r["vpu_ops_per_s"] / (vpu)  # ops vs FMA slots
            line += f"  VPU ~{100*util:5.1f}% of measured ceiling"
        print(line, flush=True)
    print("NOTE: utilization counts BINNED pairs; the saturation early-exit\n"
          "skips chunks whose tile is opaque, so executed pairs <= binned\n"
          "pairs and the printed % is an upper bound on work but a\n"
          "lower bound on how close the kernel runs to the issue ceiling.\n"
          ">=100% means the early-exit is skipping a nontrivial fraction.",
          flush=True)


if __name__ == "__main__":
    main()
