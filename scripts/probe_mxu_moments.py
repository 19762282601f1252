#!/usr/bin/env python
"""Probe: can the backward's moment reduction ride the MXU?

BASELINE.md's round-5 speed-of-light closure leaves one unproven
candidate: replacing the per-splat sublane-reduce chains with matmuls
against shared monomial operands. This probe times three standalone
kernels that isolate JUST the reduction structure (K splats x one
(32, 128) tile, fake z planes derived from a carry so nothing folds):

  vpu   -- the production separable reduction (_moment_reduce shape):
           3 z-family sublane chains + vx-row monomials + 1 cross-lane.
  mxu   -- per-splat jnp.dot(z (32,128), Vx (128, 8)) -> (32, 8) then a
           tiny VPU stage-2 over sublanes (vy monomials). Tests whether
           small in-loop MXU matmuls issue fast enough to beat chains.
  mxu2  -- z-scratch variant: the loop only STORES z into a
           (K, 32, 128) VMEM scratch (the G-cache access pattern); one
           batched contraction afterwards. Tests whether Mosaic accepts
           any batched formulation (rank-3 dot / reshape) at all -- if
           it fails to lower, that closes the candidate.

Small shapes, grid (1,1), tiny compile. Numbers are structural ceilings,
not end-to-end: the winner would still need wiring into the real
backward.
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

K = 512
TH, TW = 32, 128
REPS = 200


def _fake_z(k, carry):
    # Cheap per-splat plane that depends on the carry so the loop cannot
    # be folded away; mimics z = dL_da * alpha magnitudes.
    return carry * (jnp.float32(1e-6) * (k + 1)) + jnp.float32(1e-3)


def kernel_vpu(out_ref, *, n_k):
    vy = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0).astype(
        jnp.float32) - 16.0
    vx_row = jax.lax.broadcasted_iota(jnp.int32, (1, TW), 1).astype(
        jnp.float32) - 64.0
    carry0 = jnp.full((TH, TW), 0.5, jnp.float32)
    acc0 = jnp.zeros((1, TW), jnp.float32)

    def body(k, st):
        carry, acc = st
        z = _fake_z(k, carry)
        zvy = z * vy
        r0 = jnp.sum(z, axis=0, keepdims=True)
        r1 = jnp.sum(zvy, axis=0, keepdims=True)
        r2 = jnp.sum(zvy * vy, axis=0, keepdims=True)
        c1 = jnp.sum(z * carry, axis=0, keepdims=True)
        c2 = jnp.sum(zvy * carry, axis=0, keepdims=True)
        c3 = jnp.sum(z * z, axis=0, keepdims=True)
        r0x = r0 * vx_row
        stacked = jnp.concatenate(
            [r0x, r1, r0x * vx_row, r1 * vx_row, r2, c1, c2, c3, r0], 0)
        col = jnp.sum(stacked, axis=1, keepdims=True)     # (9, 1)
        acc = acc + jnp.sum(col)
        return carry * jnp.float32(0.999) + z * jnp.float32(1e-4), acc

    _, acc = jax.lax.fori_loop(0, n_k, body, (carry0, acc0))
    out_ref[...] = acc


def kernel_mxu(out_ref, *, n_k):
    vy_col = jax.lax.broadcasted_iota(jnp.int32, (TH, 8), 0).astype(
        jnp.float32) - 16.0
    vx = jax.lax.broadcasted_iota(jnp.int32, (TW, 8), 0).astype(
        jnp.float32) - 64.0
    lane = jax.lax.broadcasted_iota(jnp.int32, (TW, 8), 1)
    # Vx columns: [1, vx, vx^2, 0...]
    Vx = jnp.where(lane == 0, 1.0,
                   jnp.where(lane == 1, vx, jnp.where(lane == 2, vx * vx,
                                                      0.0))).astype(jnp.float32)
    carry0 = jnp.full((TH, TW), 0.5, jnp.float32)
    acc0 = jnp.zeros((1, TW), jnp.float32)

    def body(k, st):
        carry, acc = st
        z = _fake_z(k, carry)
        A = jax.lax.dot_general(
            z, Vx, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)            # (32, 8)
        # stage 2 (tiny): vy monomials over sublanes of A
        s0 = jnp.sum(A, axis=0, keepdims=True)             # (1, 8)
        s1 = jnp.sum(A * vy_col[:, :1], axis=0, keepdims=True)
        s2 = jnp.sum(A * (vy_col[:, :1] * vy_col[:, :1]), axis=0,
                     keepdims=True)
        # color-ish sums stay VPU (3 chains)
        c1 = jnp.sum(z * carry)
        c2 = jnp.sum(z * z)
        acc = acc + (jnp.sum(s0) + jnp.sum(s1) + jnp.sum(s2) + c1 + c2)
        return carry * jnp.float32(0.999) + z * jnp.float32(1e-4), acc

    _, acc = jax.lax.fori_loop(0, n_k, body, (carry0, acc0))
    out_ref[...] = acc


def kernel_mxu2(out_ref, scratch_ref, *, n_k):
    carry0 = jnp.full((TH, TW), 0.5, jnp.float32)

    def body(k, carry):
        z = _fake_z(k, carry)
        scratch_ref[k] = z
        return carry * jnp.float32(0.999) + z * jnp.float32(1e-4)

    jax.lax.fori_loop(0, n_k, body, carry0)
    vy = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0).astype(
        jnp.float32) - 16.0
    vx = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1).astype(
        jnp.float32) - 64.0
    Z = scratch_ref[...]                                   # (K, TH, TW)
    # Batched contraction over BOTH tile dims: einsum('krl,rlm->km').
    V = jnp.stack([jnp.ones_like(vx), vx, vy, vx * vx, vx * vy, vy * vy,
                   vx, vy, vx], axis=-1)                   # (TH, TW, 9)
    M = jax.lax.dot_general(
        Z, V, (((1, 2), (0, 1)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)                # (K, 9)
    out_ref[...] = jnp.sum(M.reshape(4, K * 9 // 4), axis=0,
                           keepdims=True)[:, :TW]


def build(kind):
    fn = kernel_vpu if kind == "vpu" else kernel_mxu
    return pl.pallas_call(
        functools.partial(fn, n_k=K),
        out_shape=jax.ShapeDtypeStruct((1, TW), jnp.float32),
    )


def time_kernel(kind):
    try:
        if kind == "mxu2":
            from jax.experimental.pallas import tpu as pltpu

            call = pl.pallas_call(
                functools.partial(kernel_mxu2, n_k=K),
                out_shape=jax.ShapeDtypeStruct((1, TW), jnp.float32),
                scratch_shapes=[pltpu.VMEM((K, TH, TW), jnp.float32)],
            )
        else:
            call = build(kind)

        @jax.jit
        def many():
            def step(c, _):
                o = call()
                return c + jnp.sum(o), None
            s, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
            return s

        t0 = time.perf_counter()
        v = float(many())
        print(f"  {kind}: compiled+first in {time.perf_counter()-t0:.1f}s "
              f"(val {v:.3e})", flush=True)
        t0 = time.perf_counter()
        v = float(many())
        dt = (time.perf_counter() - t0) / REPS
        per_pair = dt / K
        print(f"  {kind}: {dt*1e6:.1f} us/call, {per_pair*1e9:.1f} ns per "
              f"splat-tile reduction", flush=True)
        return dt
    except Exception as e:
        print(f"  {kind}: FAILED to lower/run: {type(e).__name__}: "
              f"{str(e)[:500]}", flush=True)
        return None


def main():
    import gs2d_tpu
    gs2d_tpu.enable_compilation_cache()
    print(f"probe: K={K}, tile ({TH},{TW}), {REPS} reps", flush=True)
    for kind in ("vpu", "mxu", "mxu2"):
        time_kernel(kind)


if __name__ == "__main__":
    main()
