"""MXU-formulated tile rasterizer (EXPERIMENTAL, not the production path).

The v1 kernels (render_pallas.py) evaluate each splat's footprint with a
fori_loop of VPU ops per splat -- correct, but the FLOPs never touch the
MXU. This variant reformulates the hot math as matrix products:

- **Alpha evaluation as a matmul.** The Mahalanobis form is a degree-2
  polynomial in pixel coordinates, so for a chunk of K splats over a tile of
  P pixels:  D2 (K, P) = Coef (K, 8) @ Basis (8, P),  with per-splat
  coefficients expressed in *tile-centered* coordinates (bounded magnitudes;
  fp32-safe because contributing pixels have D2 <= 18 -- far pixels flush to
  alpha 0 anyway). One 128x128-systolic pass replaces ~25 VPU ops per splat.
- **Backward pixel reductions as moment matmuls.** Every gradient sum
  Sum_p q_kp * (polynomial in x, y) factors into per-splat linear
  combinations of moments  Q (K, P) @ BasisM (P, 6)  and color sums
  W (K, P) @ gC (P, 3): two matmuls replace 9 cross-lane reductions per
  splat.
- The only sequential dependency left is the transmittance chain -- K cheap
  (8, 128) steps per chunk reading a precomputed alpha scratch.

Numerics note: D2 via the coefficient matmul is allclose (~1e-4) but not
bit-identical to v1's direct evaluation; the exact integer coverage bounds
(trunc semantics, main.cpp:490-508) are reproduced exactly, so masks match.
Gradient formulas are the reference's (DERIVATION.md sections 5).

Layout: tile (8, 128) pixels; chunks of KC splats; everything (KC, 8, 128)
or (KC, small) with K on sublanes.

Status (round 1, measured on v5e): correct in interpret mode and, with
Precision.HIGHEST, on hardware -- but ~2.4x SLOWER than the v1 VPU kernels.
Two reasons: (a) f32 MXU matmuls decompose into multiple bf16 passes (and
need HIGHEST precision here, the tile-centered d2 cancellation is too
sensitive for the default), (b) contraction dims of 8/6 leave the 128x128
systolic array ~94% idle, and the per-chunk alpha/q/w scratch round-trips
add VMEM traffic the fused v1 loop never pays. Kept as a documented
alternative formulation + interpret-mode test; the production path remains
render_pallas.l2_render_and_grads.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gs2d_tpu.config import EXP_APPROX_FLUSH, SplatConfig
from gs2d_tpu.ops import tiles as tl
from gs2d_tpu.ops.render_pallas import (
    G_CB, G_CG, G_CR, G_OP, G_PX, G_PY, G_ROT, G_SX, G_SY, N_GRAD_FIELDS,
    _segment_grads, _should_interpret, pad_ref_chw)
from gs2d_tpu.params import GaussianParams

F32 = jnp.float32


def _field_col(params_ref, i):
    """(K, 1) column of one packed field; K stays on sublanes."""
    return params_ref[0, :, i:i + 1]


def _exp_vec(x, use_approx: bool):
    if not use_approx:
        return jnp.exp(x)
    x = F32(1.0) + x * F32(0.125)
    flush = x < F32(EXP_APPROX_FLUSH)
    x = x * x
    x = x * x
    x = x * x
    return jnp.where(flush, F32(0.0), x)


def _chunk_alpha(params_ref, cfg: SplatConfig, tile_y0, tile_x0):
    """Coverage-masked alpha and G for a whole chunk over the tile.

    Returns (alpha (K,8,128), G (K,8,128), per-splat columns dict).
    """
    th, tw = cfg.tile_h, cfg.tile_w
    kc = params_ref.shape[1]

    px = _field_col(params_ref, tl.FIELD_PX)
    py = _field_col(params_ref, tl.FIELD_PY)
    a = _field_col(params_ref, tl.FIELD_A)
    b = _field_col(params_ref, tl.FIELD_B)
    d = _field_col(params_ref, tl.FIELD_D)
    h = _field_col(params_ref, tl.FIELD_H)
    op = _field_col(params_ref, tl.FIELD_OP)

    # Tile-centered coordinates: x' = x + 0.5 - cx, with cx the tile center.
    cx = tile_x0.astype(F32) + F32(tw / 2.0)
    cy = tile_y0.astype(F32) + F32(th / 2.0)
    ex = px - cx  # (K,1): splat center in tile-centered coords
    ey = py - cy

    # d2 = a(x'-ex)^2 + 2b(x'-ex)(y'-ey) + d(y'-ey)^2 as a polynomial in
    # (x', y'): coefficients bounded because both |x'|,|y'| <= 64+th and
    # contributing splats sit near the tile.
    c_xx = a
    c_xy = F32(2.0) * b
    c_yy = d
    c_x = F32(-2.0) * (a * ex + b * ey)
    c_y = F32(-2.0) * (d * ey + b * ex)
    c_0 = a * ex * ex + F32(2.0) * b * ex * ey + d * ey * ey
    zero = jnp.zeros_like(a)
    coef = jnp.concatenate([c_xx, c_xy, c_yy, c_x, c_y, c_0, zero, zero],
                           axis=1)  # (K, 8)

    # Basis (8, P): rows [x'^2, x'y', y'^2, x', y', 1, 0, 0] per flat pixel.
    row = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
    xp = (col.astype(F32) + F32(0.5)) - F32(tw / 2.0)   # x' in tile coords
    yp = (row.astype(F32) + F32(0.5)) - F32(th / 2.0)
    p_flat = lambda m: m.reshape(1, th * tw)
    basis = jnp.concatenate([
        p_flat(xp * xp), p_flat(xp * yp), p_flat(yp * yp),
        p_flat(xp), p_flat(yp), jnp.ones((1, th * tw), F32),
        jnp.zeros((2, th * tw), F32)], axis=0)  # (8, P)

    d2 = jnp.dot(coef, basis, preferred_element_type=F32,
                 precision=jax.lax.Precision.HIGHEST)  # (K, P) on MXU
    d2 = d2.reshape(kc, th, tw)

    # Exact integer coverage (reference trunc loop bounds, main.cpp:490-508).
    yy = tile_y0 + jax.lax.broadcasted_iota(jnp.int32, (1, th), 1)  # (1, th)
    beg_y = jnp.trunc(py - h).astype(jnp.int32)   # (K,1)
    end_y = jnp.trunc(py + h).astype(jnp.int32)
    row_ok = (yy >= beg_y) & (yy <= end_y)        # (K, th)

    vy = (yy.astype(F32) + F32(0.5)) - py         # (K, th)
    qb = F32(2.0) * b * vy
    qc = d * vy * vy - F32(cfg.cutoff_sq)
    disc = qb * qb - F32(4.0) * a * qc
    q_ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    sgn = jnp.where(qb < 0.0, F32(-1.0), F32(1.0))
    kq = (-qb - sgn * sq) * F32(0.5)
    r0 = kq / a
    r1 = qc / kq
    beg_x = jnp.trunc(px + jnp.minimum(r0, r1)).astype(jnp.int32)  # (K, th)
    end_x = jnp.trunc(px + jnp.maximum(r0, r1)).astype(jnp.int32)

    xx = tile_x0 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, tw), 2)  # (1,1,tw)
    # Mosaic can't insert a minor dim on i1 vectors; widen masks to i32
    # before the axis expansion.
    row_mask = (row_ok & q_ok).astype(jnp.int32)          # (K, th)
    y_inside = (yy < cfg.height).astype(jnp.int32)        # (1, th)
    cover = (row_mask[:, :, None] > 0) \
        & (xx >= beg_x[:, :, None]) & (xx <= end_x[:, :, None]) \
        & (y_inside[:, :, None] > 0) & (xx < cfg.width)

    G = _exp_vec(F32(-0.5) * d2, cfg.use_exp_approx)
    alpha = jnp.where(cover, G * op[:, :, None], F32(0.0))
    return alpha, G, {"basis": basis, "xp": xp, "yp": yp}


def _l2_mxu_kernel(count_ref, params_ref, ref_ref,
                   color_ref, grads_ref, t_ref, c1_ref, t1_ref,
                   alpha_scr, q_scr, w_scr,
                   *, cfg: SplatConfig, kc: int, n_chunks: int):
    """Fused L2 train kernel, MXU formulation. Grid (tiles, phase, chunk);
    carries live in revisited output blocks as in the v1 chunked kernel."""
    th, tw = cfg.tile_h, cfg.tile_w
    tile_idx = pl.program_id(0)
    phase = pl.program_id(1)
    chunk = pl.program_id(2)
    ti = tile_idx // cfg.n_tiles_x
    tj = tile_idx % cfg.n_tiles_x
    tile_y0 = ti * th
    tile_x0 = tj * tw
    n_here = jnp.clip(count_ref[tile_idx] - chunk * kc, 0, kc)
    mt = F32(cfg.min_throughput)
    zero = jnp.zeros((th, tw), F32)

    @pl.when((phase == 0) & (chunk == 0))
    def _():
        color_ref[0, 0] = zero
        color_ref[0, 1] = zero
        color_ref[0, 2] = zero
        t_ref[0] = jnp.ones((th, tw), F32)

    @pl.when((phase == 1) & (chunk == 0))
    def _():
        c1_ref[0, 0] = zero
        c1_ref[0, 1] = zero
        c1_ref[0, 2] = zero
        t1_ref[0] = jnp.ones((th, tw), F32)


    @pl.when(phase == 0)
    def _():
        @pl.when(jnp.max(t_ref[0]) >= mt)
        def _():
            alpha, _, _ = _chunk_alpha(params_ref, cfg, tile_y0, tile_x0)
            alpha_scr[...] = alpha

            def body(k, carry):
                cr, cg, cb, T = carry
                a_k = alpha_scr[k]
                live = T >= mt
                w = jnp.where(live, T * a_k, F32(0.0))
                cr = cr + w * params_ref[0, k, tl.FIELD_CR]
                cg = cg + w * params_ref[0, k, tl.FIELD_CG]
                cb = cb + w * params_ref[0, k, tl.FIELD_CB]
                T = jnp.where(live, T * (F32(1.0) - a_k), T)
                return cr, cg, cb, T

            carry = (color_ref[0, 0], color_ref[0, 1], color_ref[0, 2],
                     t_ref[0])
            cr, cg, cb, T = jax.lax.fori_loop(0, n_here, body, carry)
            color_ref[0, 0] = cr
            color_ref[0, 1] = cg
            color_ref[0, 2] = cb
            t_ref[0] = T

    @pl.when(phase == 1)
    def _():
        grads_ref[...] = jnp.zeros_like(grads_ref)

        @pl.when(jnp.max(t1_ref[0]) >= mt)
        def _():
            alpha, G, aux = _chunk_alpha(params_ref, cfg, tile_y0, tile_x0)
            alpha_scr[...] = alpha
            fin_r = color_ref[0, 0]
            fin_g = color_ref[0, 1]
            fin_b = color_ref[0, 2]
            gc_r = fin_r - ref_ref[0, 0]
            gc_g = fin_g - ref_ref[0, 1]
            gc_b = fin_b - ref_ref[0, 2]

            # Sequential replay: per splat store q = dL/dalpha and
            # w_c = alpha * T (masked); pixel reductions deferred to matmuls.
            def body(k, carry):
                cr, cg, cb, T = carry
                a_k = alpha_scr[k]
                live = T >= mt
                mw = live.astype(F32)
                w = jnp.where(live, T * a_k, F32(0.0))
                w_scr[k] = (a_k * T) * mw
                c_r = params_ref[0, k, tl.FIELD_CR]
                c_g = params_ref[0, k, tl.FIELD_CG]
                c_b = params_ref[0, k, tl.FIELD_CB]
                cr = cr + w * c_r
                cg = cg + w * c_g
                cb = cb + w * c_b
                inv1ma = F32(1.0) / jnp.where(
                    a_k >= F32(1.0), F32(1e-15), F32(1.0) - a_k)
                dL_da = (
                    gc_r * (c_r * T - (fin_r - cr) * inv1ma)
                    + gc_g * (c_g * T - (fin_g - cg) * inv1ma)
                    + gc_b * (c_b * T - (fin_b - cb) * inv1ma)
                ) * mw
                q_scr[k] = dL_da * a_k   # note: alpha factored in here
                T = jnp.where(live, T * (F32(1.0) - a_k), T)
                return cr, cg, cb, T

            comp = (c1_ref[0, 0], c1_ref[0, 1], c1_ref[0, 2], t1_ref[0])
            cr, cg, cb, T = jax.lax.fori_loop(0, n_here, body, comp)
            c1_ref[0, 0] = cr
            c1_ref[0, 1] = cg
            c1_ref[0, 2] = cb
            t1_ref[0] = T

            # Zero the unprocessed chunk tail (scratch persists across grid
            # steps, so stale rows would leak into the moment matmuls).
            ks = jax.lax.broadcasted_iota(jnp.int32, (kc, 1, 1), 0)
            live_k = ks < n_here
            q = jnp.where(live_k, q_scr[...], F32(0.0)).reshape(kc, th * tw)
            w_c = jnp.where(live_k, w_scr[...], F32(0.0)).reshape(kc, th * tw)
            al = jnp.where(live_k, alpha_scr[...], F32(0.0))

            # dL/d(opacity) = Sum dL_da * G = Sum (q / op): alpha = G*op and
            # q = dL_da*alpha, so q/op = dL_da*G (0 where q is 0; padded
            # slots have op 0, guarded).
            op = _field_col(params_ref, tl.FIELD_OP)
            qop = (q / jnp.maximum(op, F32(1e-30)))        # (K, P)
            del al, G

            # Moment matmuls (MXU): contract over the pixel axis.
            basis6 = aux["basis"][:6]                      # (6, P)
            contract_p = (((1,), (1,)), ((), ()))
            mom = jax.lax.dot_general(
                q, basis6, contract_p, preferred_element_type=F32,
                precision=jax.lax.Precision.HIGHEST)   # (K, 6)
            gc3 = jnp.concatenate(
                [gc_r.reshape(1, th * tw), gc_g.reshape(1, th * tw),
                 gc_b.reshape(1, th * tw)], axis=0)        # (3, P)
            col_sums = jax.lax.dot_general(
                w_c, gc3, contract_p, preferred_element_type=F32,
                precision=jax.lax.Precision.HIGHEST)   # (K, 3)
            op_sum = jnp.sum(qop, axis=1, keepdims=True)    # (K, 1)

            # Per-splat linear combinations of the moments (tile-centered
            # coords x' = x - cx => vx = x' - ex).
            px = _field_col(params_ref, tl.FIELD_PX)
            py = _field_col(params_ref, tl.FIELD_PY)
            a = _field_col(params_ref, tl.FIELD_A)
            b = _field_col(params_ref, tl.FIELD_B)
            d = _field_col(params_ref, tl.FIELD_D)
            sx = _field_col(params_ref, tl.FIELD_SX)
            sy = _field_col(params_ref, tl.FIELD_SY)
            cosT = _field_col(params_ref, tl.FIELD_COS)
            sinT = _field_col(params_ref, tl.FIELD_SIN)
            cx = tile_x0.astype(F32) + F32(tw / 2.0)
            cy = tile_y0.astype(F32) + F32(th / 2.0)
            ex = px - cx
            ey = py - cy
            m_xx, m_xy, m_yy, m_x, m_y, m_1 = (
                mom[:, 0:1], mom[:, 1:2], mom[:, 2:3],
                mom[:, 3:4], mom[:, 4:5], mom[:, 5:6])
            # Sum q*vx = m_x - ex*m_1 ; Sum q*vx^2 = m_xx - 2ex m_x + ex^2 m_1
            s_x = m_x - ex * m_1
            s_y = m_y - ey * m_1
            s_xx = m_xx - F32(2.0) * ex * m_x + ex * ex * m_1
            s_yy = m_yy - F32(2.0) * ey * m_y + ey * ey * m_1
            s_xy = m_xy - ex * m_y - ey * m_x + ex * ey * m_1

            # d(alpha)/d(mu) = 0.5*alpha*(2a vx + 2b vy, 2d vy + 2b vx)
            g_px = a * s_x + b * s_y
            g_py = d * s_y + b * s_x
            # scales (DERIVATION.md section 5)
            inv_sx3 = F32(1.0) / (sx * sx * sx)
            inv_sy3 = F32(1.0) / (sy * sy * sy)
            g_sx = inv_sx3 * (cosT * cosT * s_xx
                              + F32(2.0) * sinT * cosT * s_xy
                              + sinT * sinT * s_yy)
            g_sy = inv_sy3 * (sinT * sinT * s_xx
                              - F32(2.0) * sinT * cosT * s_xy
                              + cosT * cosT * s_yy)
            # rotation
            rot_k = (sx * sx - sy * sy) / (sx * sx * sy * sy)
            g_rot = rot_k * ((cosT * cosT - sinT * sinT) * s_xy
                             - sinT * cosT * (s_xx - s_yy))

            # Assemble (K, 16) rows by concatenation (in-kernel scatter is
            # not lowerable); column order must match G_* indices.
            out = jnp.concatenate([
                g_px, g_py, g_sx, g_sy, g_rot,
                col_sums[:, 0:1], col_sums[:, 1:2], col_sums[:, 2:3],
                op_sum,
                jnp.zeros((kc, N_GRAD_FIELDS - 9), F32),
            ], axis=1)
            grads_ref[0] = out


def l2_render_and_grads_mxu(
    binning: tl.TileBinning,
    ref_chw: jax.Array,
    n_splats: int,
    cfg: SplatConfig,
    chunk: int = 256,
    interpret: bool | None = None,
) -> Tuple[jax.Array, GaussianParams]:
    """MXU-formulated fused L2 path; same contract as l2_render_and_grads."""
    if interpret is None:
        interpret = _should_interpret()
    k = binning.ids.shape[1]
    kc = min(chunk, k)
    if k % kc:
        raise ValueError(f"per-tile capacity {k} must divide by chunk {kc}")
    n_chunks = k // kc
    gy, gx = cfg.n_tiles_y, cfg.n_tiles_x
    n_tiles = gy * gx
    th, tw = cfg.tile_h, cfg.tile_w
    hp, wp = cfg.padded_height, cfg.padded_width

    color, partial, _, _, _ = pl.pallas_call(
        functools.partial(_l2_mxu_kernel, cfg=cfg, kc=kc, n_chunks=n_chunks),
        grid=(n_tiles, 2, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, kc, tl.N_FIELDS), lambda t, p, c: (t, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, th, tw),
                         lambda t, p, c, gx=gx: (0, 0, t // gx, t % gx),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, th, tw),
                         lambda t, p, c, gx=gx: (0, 0, t // gx, t % gx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kc, N_GRAD_FIELDS),
                         lambda t, p, c, n_chunks=n_chunks:
                         (t * n_chunks + c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw),
                         lambda t, p, c, gx=gx: (0, t // gx, t % gx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, th, tw),
                         lambda t, p, c, gx=gx: (0, 0, t // gx, t % gx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw),
                         lambda t, p, c, gx=gx: (0, t // gx, t % gx),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 3, hp, wp), F32),
            jax.ShapeDtypeStruct((n_tiles * n_chunks, kc, N_GRAD_FIELDS), F32),
            jax.ShapeDtypeStruct((1, hp, wp), F32),
            jax.ShapeDtypeStruct((1, 3, hp, wp), F32),
            jax.ShapeDtypeStruct((1, hp, wp), F32),
        ],
        scratch_shapes=[
            pltpu.VMEM((kc, th, tw), F32),  # alpha
            pltpu.VMEM((kc, th, tw), F32),  # q = dL_da * alpha
            pltpu.VMEM((kc, th, tw), F32),  # w_c = alpha * T (masked)
        ],
        interpret=interpret,
    )(binning.count, binning.tile_params, ref_chw)

    # Rows are already per-(tile, chunk, splat) in binning-id order: one
    # scatter-add segments them onto the splat axis.
    rows = partial.reshape(n_tiles * n_chunks * kc, N_GRAD_FIELDS)
    flat_ids = binning.ids.reshape(-1)
    acc = jnp.zeros((n_splats, N_GRAD_FIELDS), F32).at[flat_ids].add(
        rows, mode="drop")
    grads = GaussianParams(
        pos=acc[:, (G_PX, G_PY)],
        sx=acc[:, G_SX], sy=acc[:, G_SY], rot=acc[:, G_ROT],
        color=acc[:, (G_CR, G_CG, G_CB)],
        opacity=acc[:, G_OP],
    )
    color = jnp.transpose(color[0], (1, 2, 0))[: cfg.height, : cfg.width]
    return color, grads
