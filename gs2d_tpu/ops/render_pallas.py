"""Production rasterizer: fused Pallas tile kernels (forward + backward).

TPU-first design (deliberately not the reference's loop structure):

- The screen is cut into (tile_h, tile_w) pixel tiles; ``bin_splats``
  (ops/tiles.py) gives each tile its index-ordered splat list with packed
  per-splat scalars pre-gathered to a (n_tiles, N_FIELDS, K) array.
- One Pallas grid step per tile. The Pallas pipeline double-buffers the
  per-tile parameter block HBM->VMEM while the previous tile computes.
- Inside the kernel a ``fori_loop`` walks the tile's splat list in index
  order, evaluating coverage + alpha for the whole tile at once (VPU-shaped
  (tile_h, tile_w) vector ops) and compositing front-to-back. The reference's
  per-pixel early-out (T < 1/256, main.cpp:518-521) and truncated integer
  bounds (main.cpp:490-508) are reproduced as masks, so results match the
  sequential C++ loop allclose.
- The backward kernel replays the composite per tile (the reference's
  suffix-color trick, main.cpp:548-712) and reduces per-splat gradients over
  the tile's pixels into a (n_tiles, 16, K) partial-gradient array; a single
  scatter-add outside the kernel segments those back to the (N,) splat axis
  -- the atomics-free TPU equivalent of the reference's dSplats accumulation.

Gradient field packing in the backward output (sublane index):
  0 gpx, 1 gpy, 2 gsx, 3 gsy, 4 grot, 5 gcr, 6 gcg, 7 gcb, 8 gop
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
from gs2d_tpu.params import GaussianParams

# Gradient sublane indices in the backward kernel output. The production
# kernels emit raw z-MOMENTS in these rows (G_PX<-M1=sum z*vx, G_PY<-M2,
# G_SX<-M3=sum z*vx^2, G_SY<-M4=sum z*vx*vy, G_ROT<-M5=sum z*vy^2,
# G_OP<-M0=sum z; color rows are final) -- moments_to_grads applies the
# per-splat scalar combinations that turn them into parameter gradients.
G_PX, G_PY, G_SX, G_SY, G_ROT, G_CR, G_CG, G_CB, G_OP = range(9)
N_GRAD_FIELDS = 16  # 9 used; padded to 16 sublanes for aligned DMA


def _exp_term(x, use_approx: bool):
    """exp(x) with the reference's fast approximation (main.cpp:49-83)."""
    if not use_approx:
        return jnp.exp(x)
    x = jnp.float32(1.0) + x * jnp.float32(0.125)
    flush = x < jnp.float32(EXP_APPROX_FLUSH)
    x = x * x
    x = x * x
    x = x * x
    return jnp.where(flush, jnp.float32(0.0), x)


def _trunc_i32(x):
    return jnp.trunc(x).astype(jnp.int32)


def _splat_terms(params_ref, k, fx, fy, xx, yy, inside, T, cfg: SplatConfig):
    """Shared per-splat coverage + alpha over the tile (both kernels).

    Returns (live_mask, alpha, G, vx, vy, scalars dict)."""
    f = lambda i: params_ref[0, k, i]
    px, py = f(tl.FIELD_PX), f(tl.FIELD_PY)
    a, b, d = f(tl.FIELD_A), f(tl.FIELD_B), f(tl.FIELD_D)
    h = f(tl.FIELD_H)
    op = f(tl.FIELD_OP)

    vy = fy - py
    vx = fx - px

    # Row walk bounds: y in [trunc(py-h), trunc(py+h)] (main.cpp:490-492).
    beg_y = _trunc_i32(py - h)
    end_y = _trunc_i32(py + h)
    row_ok = (yy >= beg_y) & (yy <= end_y)

    # Exact per-row x interval from the ellipse quadratic
    # (main.cpp:497-509, Form.pdf section 13).
    qb = jnp.float32(2.0) * b * vy
    qc = d * vy * vy - jnp.float32(cfg.cutoff_sq)
    disc = qb * qb - jnp.float32(4.0) * a * qc
    q_ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    sgn = jnp.where(qb < 0.0, jnp.float32(-1.0), jnp.float32(1.0))
    kq = (-qb - sgn * sq) * jnp.float32(0.5)
    r0 = kq / a
    r1 = qc / kq
    beg_x = _trunc_i32(px + jnp.minimum(r0, r1))
    end_x = _trunc_i32(px + jnp.maximum(r0, r1))
    col_ok = (xx >= beg_x) & (xx <= end_x)

    cover = row_ok & q_ok & col_ok & inside

    d2 = a * vx * vx + jnp.float32(2.0) * b * vx * vy + d * vy * vy
    G = _exp_term(jnp.float32(-0.5) * d2, cfg.use_exp_approx)
    alpha = G * op
    live = cover & (T >= jnp.float32(cfg.min_throughput))
    # sx/sy/cos/sin are no longer read here: the backward emits raw
    # z-moments and their combinations happen in moments_to_grads.
    return live, alpha, G, vx, vy, {
        "a": a, "b": b, "d": d,
        "cr": f(tl.FIELD_CR), "cg": f(tl.FIELD_CG), "cb": f(tl.FIELD_CB),
    }


def _tile_coords(cfg: SplatConfig, row0_px=0):
    """Integer pixel coords + centers for the current grid tile; ``row0_px``
    offsets rows into global coordinates for band rendering."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    th, tw = cfg.tile_h, cfg.tile_w
    yy = row0_px + ti * th + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
    xx = tj * tw + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
    fy = yy.astype(jnp.float32) + jnp.float32(0.5)
    fx = xx.astype(jnp.float32) + jnp.float32(0.5)
    inside = (yy < cfg.height) & (xx < cfg.width)
    return yy, xx, fy, fx, inside


UNROLL = 4  # splats per loop iteration (padding is benign, see tiles.py)


def _unrolled(n_k):
    return UNROLL if n_k % UNROLL == 0 else 1



def identity_trans(cfg: SplatConfig, hp: int, wp: int, row0_px=0):
    """Identity transmittance plane: 1 inside the image, 0 on padding.

    Out-of-image pixels never composite (the kernels' ``inside`` mask), so
    zero is exact there -- and it lets the saturation early-exit ignore
    padding, which otherwise pins max(T) at 1 on boundary tiles forever."""
    yy = row0_px + jnp.arange(hp, dtype=jnp.int32)[:, None]
    xx = jnp.arange(wp, dtype=jnp.int32)[None, :]
    return ((yy < cfg.height) & (xx < cfg.width)).astype(jnp.float32)


SAT_CHECK_EVERY = 32  # splat-steps between saturation checks (divides K)
# Population size from which the chunked/flat kernels use the in-loop
# saturating walk. Measured on v5e (scanned ms/iter, BASELINE.md): the walk
# wins at deep lists (10k flat 10.4 -> 8.65, 100k 113.7 -> 78.8) but loses
# at shallow ones (2k flat 2.50 -> 2.68, 4k 4.53 -> 4.84) where tiles
# rarely saturate and the loop-carried vector->scalar reduce only stalls.
SAT_WALK_THRESHOLD = 8192


def _sat_walk(cfg: SplatConfig) -> bool:
    if cfg.n_splats >= SAT_WALK_THRESHOLD:
        from gs2d_tpu.utils.hardware import warn_if_untuned

        warn_if_untuned()  # the gate was measured on v5e
        return True
    return False


def _saturating_loop(n_live, u, step, carry, get_t, mt, k_cap,
                     saturating=True):
    """Walk the splat list in blocks, exiting as soon as the tile is
    saturated: once max(T) < mt every pixel fails the reference's
    per-pixel early-out (main.cpp:518-521), so every remaining splat's
    contribution -- composite updates and gradient columns alike -- is
    exactly zero and skipping whole blocks is bitwise-exact.

    The saturation test is a vector->scalar reduce the next block's issue
    depends on (a pipeline bubble), so it runs once per SAT_CHECK_EVERY
    splat-steps, not per unroll group. Blocks may overshoot ``n_live`` (up
    to the block size); overshoot slots are the binning's benign padding
    (zero contribution by construction), and never exceed ``k_cap``
    because the block size divides it. ``step(k, carry) -> carry`` is one
    splat-step; ``get_t(carry)`` reads the carry's transmittance plane.

    ``saturating=False`` keeps the plain count-bounded walk: measured on
    v5e, the exit wins ~10% on the chunked/flat kernels (deep lists, many
    opaque tiles) but LOSES ~25% on the small fused kernels (mini-scale
    tiles rarely saturate whole, so the while-loop structure is pure
    overhead) -- see BASELINE.md."""
    if not saturating:
        def body_f(c, cur):
            for i in range(u):
                cur = step(c * u + i, cur)
            return cur

        return jax.lax.fori_loop(0, (n_live + u - 1) // u, body_f, carry)

    g = SAT_CHECK_EVERY // u if k_cap % SAT_CHECK_EVERY == 0 else 1
    blk = g * u

    def cond(st):
        c, cur = st
        return (c * blk < n_live) & (jnp.max(get_t(cur)) >= mt)

    def body(st):
        c, cur = st

        def inner(j, cur):
            for i in range(u):
                cur = step((c * g + j) * u + i, cur)
            return cur

        if g == 1:
            cur = inner(0, cur)
        else:
            cur = jax.lax.fori_loop(0, g, inner, cur)
        return c + 1, cur

    return jax.lax.while_loop(cond, body, (jnp.int32(0), carry))[1]


def _fwd_one(params_ref, k, fx, fy, xx, yy, inside, cfg, carry,
             gcache_ref=None):
    cr_acc, cg_acc, cb_acc, T = carry
    live, alpha, G, _, _, s = _splat_terms(
        params_ref, k, fx, fy, xx, yy, inside, T, cfg)
    if gcache_ref is not None:
        # Masked Gaussian term for the backward replay (see
        # _bwd_splat_step_cached): alpha = G * op reconstructs bitwise,
        # and G == 0 pairs contribute exactly zero to every gradient.
        gcache_ref[k] = jnp.where(live, G, jnp.float32(0.0))
    w = jnp.where(live, T * alpha, jnp.float32(0.0))
    return (cr_acc + w * s["cr"], cg_acc + w * s["cg"], cb_acc + w * s["cb"],
            jnp.where(live, T * (jnp.float32(1.0) - alpha), T))


def _forward_kernel(off_ref, count_ref, params_ref, color_ref, trans_ref,
                    *, cfg: SplatConfig):
    yy, xx, fy, fx, inside = _tile_coords(cfg, off_ref[0])
    th, tw = cfg.tile_h, cfg.tile_w
    n_live = count_ref[pl.program_id(0) * cfg.n_tiles_x + pl.program_id(1)]
    u = _unrolled(params_ref.shape[1])

    def step(k, carry):
        return _fwd_one(params_ref, k, fx, fy, xx, yy, inside, cfg, carry)

    zero = jnp.zeros((th, tw), jnp.float32)
    cr_acc, cg_acc, cb_acc, T = _saturating_loop(
        n_live, u, step,
        (zero, zero, zero, inside.astype(jnp.float32)),
        lambda c: c[3], jnp.float32(cfg.min_throughput),
        params_ref.shape[1], saturating=False)
    color_ref[0, 0] = cr_acc
    color_ref[0, 1] = cg_acc
    color_ref[0, 2] = cb_acc
    trans_ref[0] = T


def _backward_kernel(off_ref, count_ref, params_ref, fin_ref, gc_ref,
                     c_in_ref, t_in_ref, grads_ref, *, cfg: SplatConfig):
    yy, xx, fy, fx, inside = _tile_coords(cfg, off_ref[0])
    th, tw = cfg.tile_h, cfg.tile_w
    n_live = count_ref[pl.program_id(0) * cfg.n_tiles_x + pl.program_id(1)]

    gc_rgb = (gc_ref[0, 0], gc_ref[0, 1], gc_ref[0, 2])
    # Per-tile constants of the cotangent-weighted replay (_bwd_splat_step):
    # gf = sum_ch gc*fin; ga0 = sum_ch gc*C_in (the ordered-monoid prefix of
    # earlier splat shards under splat sharding; zero otherwise).
    gf = (gc_rgb[0] * fin_ref[0, 0] + gc_rgb[1] * fin_ref[0, 1]
          + gc_rgb[2] * fin_ref[0, 2])
    ga0 = (gc_rgb[0] * c_in_ref[0, 0] + gc_rgb[1] * c_in_ref[0, 1]
           + gc_rgb[2] * c_in_ref[0, 2])

    n_k = grads_ref.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_k), 1)
    u = _unrolled(n_k)

    def step(k, carry):
        comp, gacc = carry
        comp, col = _bwd_splat_step(params_ref, k, fx, fy, xx, yy, inside,
                                    cfg, comp, gf, gc_rgb)
        oh = (lane == k).astype(jnp.float32)
        return comp, gacc + col * oh

    comp0 = (ga0, t_in_ref[0])
    _, gacc = _saturating_loop(
        n_live, u, step, (comp0, jnp.zeros((9, n_k), jnp.float32)),
        lambda c: c[0][1], jnp.float32(cfg.min_throughput), n_k,
        saturating=False)
    grads_ref[0] = jnp.concatenate(
        [gacc, jnp.zeros((N_GRAD_FIELDS - 9, n_k), jnp.float32)], axis=0)


def _moment_reduce(z, vx_row, vy, w_c, gc_rgb):
    """Separable two-stage reduction of the 9 per-splat tile sums -> (9, 1).

    The moments M1..M5 are sums of z * vx^a * vy^b with a + b <= 2. vx is
    constant along sublanes and vy along lanes, so the y-summation needs
    only the THREE z-family sublane chains (z, z*vy, z*vy^2); the lane
    monomials vx^a then multiply the reduced (1, tw) rows before the one
    batched cross-lane reduction. Mathematically identical to reducing
    nine full planes -- the vx multiply hoists past the y-sum -- with the
    usual <= 1 ulp reassociation (documented cross-program drift class).
    Saves 3 of 9 sublane-reduce chains and 3 of 8 monomial plane products
    per pair-step (round-5 dissection: the backward half of the fused
    kernel is reduction-dominated).

    Row order matches G_PX..G_OP: [M1, M2, M3, M4, M5, CR, CG, CB, M0].
    """
    gc_r, gc_g, gc_b = gc_rgb
    zvy = z * vy
    r0 = jnp.sum(z, axis=0, keepdims=True)             # (1, tw) sum_y z
    r1 = jnp.sum(zvy, axis=0, keepdims=True)           # sum_y z*vy
    r2 = jnp.sum(zvy * vy, axis=0, keepdims=True)      # sum_y z*vy^2
    cr = jnp.sum(gc_r * w_c, axis=0, keepdims=True)
    cg = jnp.sum(gc_g * w_c, axis=0, keepdims=True)
    cb = jnp.sum(gc_b * w_c, axis=0, keepdims=True)
    r0x = r0 * vx_row
    stacked = jnp.concatenate(
        [r0x, r1, r0x * vx_row, r1 * vx_row, r2, cr, cg, cb, r0], axis=0)
    return jnp.sum(stacked, axis=1, keepdims=True)     # (9, 1)


def _bwd_splat_step(params_ref, k, fx, fy, xx, yy, inside, cfg,
                    carry, gf, gc_rgb):
    """One splat's backward contribution on a tile: replay + 9 gradient sums.

    Returns (new (ga, T) carry, (9,1) column of per-splat sums). Shared by
    every backward kernel family.

    The replay carry is the COTANGENT-WEIGHTED prefix color
    ``ga = sum_ch gc_ch * C_prefix_ch`` (one plane), not the three prefix
    color planes: dL/dalpha only ever consumes the prefix through
    ``sum_ch gc_ch * (c_ch*T - S_ch/(1-alpha))`` with suffix
    S = final - prefix (main.cpp:616-630), which factors as
    ``T*gcdot - inv1ma*(gf - ga)`` where ``gcdot = sum_ch gc_ch*c_ch``
    (per-splat scalars x cotangent planes) and ``gf = sum_ch gc_ch*fin_ch``
    is a per-tile constant the kernels precompute. Each composite step adds
    ``w_c * c_ch`` per channel, so ga updates with ONE fma
    (ga += w_c * gcdot) instead of three -- dropping ~1/3 of the replay's
    vector ops for mathematically identical gradients (reassociated:
    <= ~1 ulp vs the per-channel form, the documented cross-program drift
    class; render_jax keeps the bit-faithful per-channel replay).

    MOMENT FORM: the column holds raw z-moments, not final gradients. All
    five geometry gradients (main.cpp:635-683, Form.pdf sections 8-10) are
    per-splat scalar combinations of ``M0=sum z``, ``M1=sum z*vx``,
    ``M2=sum z*vy``, ``M3=sum z*vx^2``, ``M4=sum z*vx*vy``,
    ``M5=sum z*vy^2`` with z = dL/dalpha * alpha (and the opacity gradient
    sum dL/dalpha * G == M0 / op, since alpha = G*op); only the moments need
    tile-wide vector work, so the kernel builds 5 moment planes (z*vx etc.,
    5 multiplies) instead of the ~19-op gradient expressions, and
    ``moments_to_grads`` applies the (a, b, d, cos, sin, 1/s^3) combinations
    on (N,) arrays outside the kernel. Same reassociation drift class.
    """
    ga, T = carry
    gc_r, gc_g, gc_b = gc_rgb
    live, alpha, G, vx, vy, s = _splat_terms(
        params_ref, k, fx, fy, xx, yy, inside, T, cfg)
    mw = live.astype(jnp.float32)

    # dL/dc = sum gC * alpha * T (main.cpp:617-620). The same masked weight
    # drives the replay composite below (alpha*T*1.0 and the select form
    # are bitwise equal for finite alpha, T).
    w_c = alpha * T * mw

    # Cotangent-weighted splat color (scalars x planes), then the replay:
    # ga tracks sum_ch gc_ch * C_prefix_ch including this splat.
    gcdot = gc_r * s["cr"] + gc_g * s["cg"] + gc_b * s["cb"]
    ga = ga + w_c * gcdot

    # (1 - alpha + 1e-15) guard, reassociation-proof (see render_jax).
    inv1ma = jnp.float32(1.0) / jnp.where(
        alpha >= jnp.float32(1.0), jnp.float32(1e-15),
        jnp.float32(1.0) - alpha)
    dL_da = (T * gcdot - (gf - ga) * inv1ma) * mw
    # Common factor of every moment (dalpha/dparam is proportional to
    # alpha for mu, s, theta -- Form.pdf sections 8-10).
    z = dL_da * alpha

    # Nine tile-wide sums via the separable two-stage reduction (vx is a
    # lane vector -- one row of the plane suffices for the x monomials).
    col = _moment_reduce(z, vx[0:1, :], vy, w_c, gc_rgb)

    T = jnp.where(live, T * (jnp.float32(1.0) - alpha), T)
    return (ga, T), col


def _bwd_splat_step_cached(params_ref, k, fx, fy, cfg, carry, gf,
                           gc_rgb, gcache_ref):
    """_bwd_splat_step from the forward's cached masked Gaussian term.

    The fused kernels' backward replays the SAME composite the forward
    just built, so ``gcache_ref[k]`` (masked G stored by _fwd_one)
    reconstructs alpha = G * op bitwise and replaces the whole
    _splat_terms re-derivation -- bounds, the per-row ellipse quadratic,
    and exp_approx (~45 vector ops per pair-step) become one VMEM load.
    Pairs masked at forward time carry G == 0, so alpha == 0 EXACTLY on
    them: every gradient term is proportional to alpha or G and vanishes,
    T*(1-0) == T bitwise, and ga gains w_c*gcdot == 0 -- no separate mask
    ops are needed at all (unlike _bwd_splat_step, whose re-derived alpha
    is nonzero on masked pairs).

    Numerics: the forward composite and every gradient are mathematically
    identical to _bwd_splat_step's (alpha is reconstructed bitwise), but
    the smaller expression tree fuses differently under XLA/Mosaic, so
    compiled gradients drift <= 1 ulp vs the re-deriving kernels -- the
    same documented drift as across tile_h or binning layouts
    (test_fused.TestGCache; bitwise cross-kernel tests pin
    alpha_cache=False). Carries (ga, T) -- see _bwd_splat_step for the
    cotangent-weighted replay factorization."""
    ga, T = carry
    gc_r, gc_g, gc_b = gc_rgb
    f = lambda i: params_ref[0, k, i]
    px, py = f(tl.FIELD_PX), f(tl.FIELD_PY)
    cr, cg, cb = f(tl.FIELD_CR), f(tl.FIELD_CG), f(tl.FIELD_CB)
    op = f(tl.FIELD_OP)

    m_G = gcache_ref[k]
    alpha = m_G * op                      # bitwise the forward's alpha
    vy = fy - py
    vx_row = fx[0:1, :] - px              # x offsets: one lane row suffices

    w_c = alpha * T
    gcdot = gc_r * cr + gc_g * cg + gc_b * cb
    ga = ga + w_c * gcdot

    inv1ma = jnp.float32(1.0) / jnp.where(
        alpha >= jnp.float32(1.0), jnp.float32(1e-15),
        jnp.float32(1.0) - alpha)
    dL_da = T * gcdot - (gf - ga) * inv1ma
    z = dL_da * alpha

    # Moment form (see _bwd_splat_step): the geometry fields (a, b, d, cos,
    # sin, sx, sy) are not read at all here -- their combinations happen in
    # moments_to_grads outside the kernel. M0/op reconstructs the opacity
    # gradient sum dL/dalpha * m_G exactly up to one scalar divide.
    col = _moment_reduce(z, vx_row, vy, w_c, gc_rgb)

    T = T * (jnp.float32(1.0) - alpha)
    return (ga, T), col


# Cache the forward's masked G per (slot, tile) in VMEM scratch when the
# whole (K, tile_h, tile_w) f32 buffer fits this budget; above it, the
# backward re-derives (the chunked kernels always re-derive -- their K is
# unbounded). v5e VMEM is ~16 MiB/core; the fused kernels' other blocks
# (tile color/ref/grads + double buffering) stay well under 1 MiB, so 12
# MiB of scratch is safe -- and it matters: the production mini config
# tunes K=512 (8 MiB at tile_h=32), which the old 6 MiB gate silently
# excluded. Measured on v5e (scripts/ab_gcache.py, mini 1k resident,
# 200-iter scan): 0.709 vs 0.875 ms/iter -- a 1.23x kernel-path win.
GCACHE_BUDGET_BYTES = 12 * 1024 * 1024


def _use_gcache(cfg: SplatConfig, k_cap: int) -> bool:
    from gs2d_tpu.utils.hardware import resolve_budget

    budget = resolve_budget("gcache_vmem", GCACHE_BUDGET_BYTES)
    return (cfg.alpha_cache
            and k_cap * cfg.tile_h * cfg.tile_w * 4 <= budget)


def _fwd_chunked_kernel(off_ref, count_ref, params_ref, color_ref, trans_ref,
                        *, cfg: SplatConfig, kc: int):
    """Chunked modular forward. Grid (tiles, chunks); the composite carry
    (color, T) lives in the output blocks, which consecutive chunk steps of
    the same tile revisit, so SMEM stays O(chunk) for any list length.
    Chunk-level saturation exit as in _l2_chunked_kernel."""
    yy, xx, fy, fx, inside = _tile_coords_grid(cfg, pl.program_id(0),
                                               off_ref[0])
    th, tw = cfg.tile_h, cfg.tile_w
    chunk = pl.program_id(1)
    n_here = jnp.clip(count_ref[pl.program_id(0)] - chunk * kc, 0, kc)
    u = _unrolled(kc)
    zero = jnp.zeros((th, tw), jnp.float32)

    @pl.when(chunk == 0)
    def _():
        color_ref[0, 0] = zero
        color_ref[0, 1] = zero
        color_ref[0, 2] = zero
        trans_ref[0] = inside.astype(jnp.float32)

    @pl.when(jnp.max(trans_ref[0]) >= jnp.float32(cfg.min_throughput))
    def _():
        def step(k, carry):
            return _fwd_one(params_ref, k, fx, fy, xx, yy, inside, cfg,
                            carry)

        carry = (color_ref[0, 0], color_ref[0, 1], color_ref[0, 2],
                 trans_ref[0])
        cr, cg, cb, T = _saturating_loop(
            n_here, u, step, carry, lambda c: c[3],
            jnp.float32(cfg.min_throughput), kc, saturating=_sat_walk(cfg))
        color_ref[0, 0] = cr
        color_ref[0, 1] = cg
        color_ref[0, 2] = cb
        trans_ref[0] = T


def _bwd_chunked_kernel(off_ref, count_ref, params_ref, fin_ref, gc_ref,
                        c_in_ref, t_in_ref, grads_ref, ga1_ref, t1_ref,
                        *, cfg: SplatConfig, kc: int):
    """Chunked modular backward. Grid (tiles, chunks); the replay prefix
    (ga1 = sum_ch gc*C_prefix, T1) lives in revisited output blocks, seeded
    from the carry-in blocks (the ordered-monoid prefix under splat
    sharding) at chunk 0. Arbitrary upstream cotangent gc, unlike the
    fused L2 kernels."""
    yy, xx, fy, fx, inside = _tile_coords_grid(cfg, pl.program_id(0),
                                               off_ref[0])
    th, tw = cfg.tile_h, cfg.tile_w
    chunk = pl.program_id(1)
    n_here = jnp.clip(count_ref[pl.program_id(0)] - chunk * kc, 0, kc)
    u = _unrolled(kc)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, kc), 1)
    gc_rgb = (gc_ref[0, 0], gc_ref[0, 1], gc_ref[0, 2])

    @pl.when(chunk == 0)
    def _():
        ga1_ref[0] = (gc_rgb[0] * c_in_ref[0, 0]
                      + gc_rgb[1] * c_in_ref[0, 1]
                      + gc_rgb[2] * c_in_ref[0, 2])
        t1_ref[0] = t_in_ref[0]

    # Fresh grads block every (tile, chunk) step: zero unconditionally so a
    # saturation-skipped chunk contributes exact zeros to the scatter.
    grads_ref[...] = jnp.zeros_like(grads_ref)

    @pl.when(jnp.max(t1_ref[0]) >= jnp.float32(cfg.min_throughput))
    def _():
        gf = (gc_rgb[0] * fin_ref[0, 0] + gc_rgb[1] * fin_ref[0, 1]
              + gc_rgb[2] * fin_ref[0, 2])

        def step(k, carry):
            comp, gacc = carry
            comp, col = _bwd_splat_step(params_ref, k, fx, fy, xx, yy,
                                        inside, cfg, comp, gf, gc_rgb)
            oh = (lane == k).astype(jnp.float32)
            return comp, gacc + col * oh

        comp = (ga1_ref[0], t1_ref[0])
        (ga, T), gacc = _saturating_loop(
            n_here, u, step, (comp, jnp.zeros((9, kc), jnp.float32)),
            lambda c: c[0][1], jnp.float32(cfg.min_throughput), kc,
            saturating=_sat_walk(cfg))
        ga1_ref[0] = ga
        t1_ref[0] = T
        grads_ref[0] = jnp.concatenate(
            [gacc, jnp.zeros((N_GRAD_FIELDS - 9, kc), jnp.float32)], axis=0)


def _should_interpret() -> bool:
    return jax.default_backend() == "cpu"


def forward_tiled(
    binning: tl.TileBinning, cfg: SplatConfig, interpret: bool | None = None,
    band_row0=0, band_rows: int | None = None, crop: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Rasterize from a tile binning. Returns (color (H,W,3), T (H,W)).

    With ``band_row0``/``band_rows`` the binning and outputs cover only that
    band of tile rows (global pixel coordinates; used by tile-axis
    sharding). ``crop=False`` keeps the padded band shape."""
    if interpret is None:
        interpret = _should_interpret()
    k = binning.ids.shape[1]
    gy = cfg.n_tiles_y if band_rows is None else band_rows
    gx = cfg.n_tiles_x
    th, tw = cfg.tile_h, cfg.tile_w
    band_hp = gy * th
    off = jnp.asarray([jnp.asarray(band_row0, jnp.int32) * th], jnp.int32)

    out_shape = [
        jax.ShapeDtypeStruct((1, 3, band_hp, cfg.padded_width), jnp.float32),
        jax.ShapeDtypeStruct((1, band_hp, cfg.padded_width), jnp.float32),
    ]
    if k > 256 and k % 256 == 0:
        # Chunked: SMEM param block and loop stay O(chunk) for any K.
        kc = 256
        color, trans = pl.pallas_call(
            functools.partial(_fwd_chunked_kernel, cfg=cfg, kc=kc),
            grid=(gy * gx, k // kc),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, kc, tl.N_FIELDS), lambda t, c: (t, c, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 3, th, tw),
                             lambda t, c, gx=gx: (0, 0, t // gx, t % gx),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, th, tw),
                             lambda t, c, gx=gx: (0, t // gx, t % gx),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=out_shape,
            interpret=interpret,
        )(off, binning.count, binning.tile_params)
    else:
        color, trans = pl.pallas_call(
            functools.partial(_forward_kernel, cfg=cfg),
            grid=(gy, gx),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, k, tl.N_FIELDS),
                             lambda i, j, gx=gx: (i * gx + j, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 3, th, tw), lambda i, j: (0, 0, i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, th, tw), lambda i, j: (0, i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=out_shape,
            interpret=interpret,
        )(off, binning.count, binning.tile_params)

    color = jnp.transpose(color[0], (1, 2, 0))
    trans = trans[0]
    if crop and band_rows is None:
        return color[: cfg.height, : cfg.width], trans[: cfg.height, : cfg.width]
    return color, trans


def backward_tiled(
    binning: tl.TileBinning,
    final_color: jax.Array,
    g_color: jax.Array,
    n_splats: int,
    cfg: SplatConfig,
    params: GaussianParams,
    carry_in=None,
    interpret: bool | None = None,
    band_row0=0,
    band_rows: int | None = None,
) -> GaussianParams:
    """Analytic parameter gradients from a tile binning + upstream cotangent.

    ``params`` is the live parameter pytree (the kernel emits raw z-moments;
    moments_to_grads needs the per-splat fields to combine them -- the same
    packed_fields expression that built binning.tile_params, CSE'd by XLA).
    ``carry_in`` = (C_in, T_in) is the composite state entering this splat
    shard (the ordered-monoid prefix under splat-axis sharding); identity
    when None. With band args, all images are band-shaped (band_rows*tile_h,
    padded width) and already padded (no crop)."""
    if interpret is None:
        interpret = _should_interpret()
    k = binning.ids.shape[1]
    banded = band_rows is not None
    gy = band_rows if banded else cfg.n_tiles_y
    gx = cfg.n_tiles_x
    n_tiles = gy * gx
    th, tw = cfg.tile_h, cfg.tile_w
    hp = gy * th
    wp = cfg.padded_width
    off = jnp.asarray([jnp.asarray(band_row0, jnp.int32) * th], jnp.int32)

    def pad_chw(img):
        if banded:  # already padded band-shaped
            return jnp.transpose(img, (2, 0, 1))[None]
        out = jnp.zeros((1, 3, hp, wp), jnp.float32)
        return out.at[0, :, : cfg.height, : cfg.width].set(
            jnp.transpose(img, (2, 0, 1)))

    fin = pad_chw(final_color)
    gc = pad_chw(g_color)
    if carry_in is None:
        c_in = jnp.zeros((1, 3, hp, wp), jnp.float32)
        t_in = identity_trans(cfg, hp, wp, off[0])[None]
    elif banded:
        c_in = pad_chw(carry_in[0])
        t_in = carry_in[1][None]
    else:
        c_in = pad_chw(carry_in[0])
        t_in = jnp.zeros((1, hp, wp), jnp.float32).at[
            0, : cfg.height, : cfg.width].set(carry_in[1])

    if k > 256 and k % 256 == 0:
        # Chunked: SMEM param block and one-hot accumulator stay O(chunk).
        kc = 256
        n_chunks = k // kc
        partial, _, _ = pl.pallas_call(
            functools.partial(_bwd_chunked_kernel, cfg=cfg, kc=kc),
            grid=(n_tiles, n_chunks),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, kc, tl.N_FIELDS), lambda t, c: (t, c, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3, th, tw),
                             lambda t, c, gx=gx: (0, 0, t // gx, t % gx),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, th, tw),
                             lambda t, c, gx=gx: (0, 0, t // gx, t % gx),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, th, tw),
                             lambda t, c, gx=gx: (0, 0, t // gx, t % gx),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, th, tw),
                             lambda t, c, gx=gx: (0, t // gx, t % gx),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, N_GRAD_FIELDS, kc),
                             lambda t, c, n_chunks=n_chunks:
                             (t * n_chunks + c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, th, tw),
                             lambda t, c, gx=gx: (0, t // gx, t % gx),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, th, tw),
                             lambda t, c, gx=gx: (0, t // gx, t % gx),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles * n_chunks, N_GRAD_FIELDS, kc),
                                     jnp.float32),
                jax.ShapeDtypeStruct((1, hp, wp), jnp.float32),
                jax.ShapeDtypeStruct((1, hp, wp), jnp.float32),
            ],
            interpret=interpret,
        )(off, binning.count, binning.tile_params, fin, gc, c_in, t_in)
        partial = partial.reshape(n_tiles, n_chunks, N_GRAD_FIELDS, kc)
        partial = jnp.transpose(partial, (0, 2, 1, 3)).reshape(
            n_tiles, N_GRAD_FIELDS, n_chunks * kc)
        return moments_to_grads(
            _segment_grads(binning, partial, n_splats), _fields_of(params, cfg))

    partial = pl.pallas_call(
        functools.partial(_backward_kernel, cfg=cfg),
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, k, tl.N_FIELDS), lambda i, j, gx=gx: (i * gx + j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, th, tw), lambda i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, th, tw), lambda i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, th, tw), lambda i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, N_GRAD_FIELDS, k), lambda i, j, gx=gx: (i * gx + j, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, N_GRAD_FIELDS, k), jnp.float32),
        interpret=interpret,
    )(off, binning.count, binning.tile_params, fin, gc, c_in, t_in)

    return moments_to_grads(
        _segment_grads(binning, partial, n_splats), _fields_of(params, cfg))


def _max_per_tile(cfg: SplatConfig) -> int:
    if cfg.max_splats_per_tile is not None:
        return cfg.max_splats_per_tile
    # Heuristic: whole population if small, else a generous cap.
    return min(max(256, cfg.n_splats // 4), 4096)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def render(params: GaussianParams, cfg: SplatConfig) -> jax.Array:
    """Tile-pipeline rasterization, differentiable via the analytic backward.

    Drop-in replacement for render_jax.render (same custom-VJP contract)."""
    binning = tl.bin_splats(params, cfg, _max_per_tile(cfg))
    return forward_tiled(binning, cfg)[0]


def _render_fwd(params, cfg):
    binning = tl.bin_splats(params, cfg, _max_per_tile(cfg))
    color, _ = forward_tiled(binning, cfg)
    return color, (params, binning, color)


def _render_bwd(cfg, res, g_color):
    params, binning, color = res
    grads = backward_tiled(binning, color, g_color, params.pos.shape[0], cfg,
                           params)
    return (grads,)


render.defvjp(_render_fwd, _render_bwd)


# ---------------------------------------------------------------------------
# Fused L2 train kernel: forward + cotangent + backward in ONE pallas_call.
# ---------------------------------------------------------------------------

def _l2_fused_kernel(off_ref, count_ref, params_ref, ref_ref, color_ref,
                     grads_ref, gcache_ref=None, *, cfg: SplatConfig):
    """One grid step per tile: composite the tile (pass 1), form the L2
    cotangent gC = C - ref in registers (the reference's dL/dC,
    main.cpp:616), then replay for gradients (pass 2). Halves kernel
    dispatches and keeps fin/gC entirely on-chip. ``off_ref`` holds the
    global pixel row of the band's first row (0 for a full image).
    With ``gcache_ref`` (VMEM scratch, (K, th, tw)) the forward stores
    each pair's masked Gaussian term and the replay runs
    _bwd_splat_step_cached (bitwise-equal, ~45 fewer vector ops/pair)."""
    yy, xx, fy, fx, inside = _tile_coords(cfg, off_ref[0])
    th, tw = cfg.tile_h, cfg.tile_w
    n_live = count_ref[pl.program_id(0) * cfg.n_tiles_x + pl.program_id(1)]

    # ---- pass 1: forward composite --------------------------------------
    u = _unrolled(params_ref.shape[1])
    mt = jnp.float32(cfg.min_throughput)

    def fwd_step(k, carry):
        return _fwd_one(params_ref, k, fx, fy, xx, yy, inside, cfg, carry,
                        gcache_ref)

    zero = jnp.zeros((th, tw), jnp.float32)
    t0 = inside.astype(jnp.float32)
    fin_r, fin_g, fin_b, _ = _saturating_loop(
        n_live, u, fwd_step, (zero, zero, zero, t0), lambda c: c[3], mt,
        params_ref.shape[1], saturating=False)
    color_ref[0, 0] = fin_r
    color_ref[0, 1] = fin_g
    color_ref[0, 2] = fin_b

    gc_rgb = (fin_r - ref_ref[0, 0], fin_g - ref_ref[0, 1],
              fin_b - ref_ref[0, 2])
    gf = gc_rgb[0] * fin_r + gc_rgb[1] * fin_g + gc_rgb[2] * fin_b

    # ---- pass 2: backward replay -----------------------------------------
    n_k = grads_ref.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_k), 1)

    def bwd_step(k, carry):
        comp, gacc = carry
        if gcache_ref is not None:
            comp, col = _bwd_splat_step_cached(
                params_ref, k, fx, fy, cfg, comp, gf, gc_rgb, gcache_ref)
        else:
            comp, col = _bwd_splat_step(params_ref, k, fx, fy, xx, yy,
                                        inside, cfg, comp, gf, gc_rgb)
        oh = (lane == k).astype(jnp.float32)
        return comp, gacc + col * oh

    comp0 = (zero, t0)
    _, gacc = _saturating_loop(
        n_live, u, bwd_step, (comp0, jnp.zeros((9, n_k), jnp.float32)),
        lambda c: c[0][1], mt, n_k, saturating=False)
    grads_ref[0] = jnp.concatenate(
        [gacc, jnp.zeros((N_GRAD_FIELDS - 9, n_k), jnp.float32)], axis=0)


def moments_to_grads(m: GaussianParams, fields: jax.Array) -> GaussianParams:
    """Per-splat scalar combinations turning the kernels' raw z-moments into
    parameter gradients (main.cpp:635-704, Form.pdf sections 8-11).

    ``m`` is a GaussianParams-shaped carrier of the reduced moments
    (pos=(M1, M2), sx=M3, sy=M4, rot=M5, opacity=M0, color final);
    ``fields`` is the (N_FIELDS, n) packed table the kernel itself consumed
    (tiles.packed_fields), so the combination coefficients are bitwise the
    kernel's values. With z = dL/dalpha * alpha and v the pixel offset:

      d/dmu    = a*M1 + b*M2, d*M2 + b*M1      (main.cpp:635-640)
      d/dsx    = 1/sx^3 * sum z*u^2,  u = cos*vx + sin*vy  (main.cpp:657-662)
      d/dsy    = 1/sy^3 * sum z*w^2,  w = sin*vx - cos*vy
      d/dtheta = -(sx^2-sy^2)/(sx^2 sy^2) * sum z*u*w      (main.cpp:680-683)
      d/dop    = sum dL/dalpha * G = M0 / op               (main.cpp:703)

    where sum z*u^2 = cos^2*M3 + 2 sin cos*M4 + sin^2*M5 (w^2 and u*w
    analogous). Everything here is O(n) elementwise -- the tile-wide vector
    work stays in the kernel as 5 moment planes. Linear in the moments, so
    psum/segment-sum of partial moments before OR after this map commute.
    Gradients reassociate vs the in-kernel per-pixel combination (<= ~1e-7
    relative, the documented cross-program drift class)."""
    a, b, d = fields[tl.FIELD_A], fields[tl.FIELD_B], fields[tl.FIELD_D]
    c, s = fields[tl.FIELD_COS], fields[tl.FIELD_SIN]
    sx, sy, op = fields[tl.FIELD_SX], fields[tl.FIELD_SY], fields[tl.FIELD_OP]
    m1, m2 = m.pos[:, 0], m.pos[:, 1]
    m3, m4, m5, m0 = m.sx, m.sy, m.rot, m.opacity
    cc, ss, cs = c * c, s * s, c * s
    inv_sx3 = 1.0 / (sx * sx * sx)
    inv_sy3 = 1.0 / (sy * sy * sy)
    th_s = -(sx * sx - sy * sy) / (sx * sx * sy * sy)
    return GaussianParams(
        pos=jnp.stack([a * m1 + b * m2, d * m2 + b * m1], axis=-1),
        sx=inv_sx3 * (cc * m3 + 2.0 * (cs * m4) + ss * m5),
        sy=inv_sy3 * (ss * m3 - 2.0 * (cs * m4) + cc * m5),
        rot=th_s * (cs * (m3 - m5) + (ss - cc) * m4),
        color=m.color,
        # M0/op reconstructs sum dL/dalpha * G (alpha = G*op). Dead slots
        # parked by densify/prune have op == 0 and exactly zero moments
        # (their footprint never composites), so the true gradient is 0 --
        # guard the 0/0 rather than poison Adam moments with NaN
        # (reference emits G directly, main.cpp:703, never dividing).
        opacity=jnp.where(op > 0.0, m0 / jnp.where(op > 0.0, op, 1.0), 0.0),
    )


def _fields_of(params: GaussianParams, cfg: SplatConfig) -> jax.Array:
    """The (N_FIELDS, n) packed per-splat scalars for moments_to_grads --
    the same expression that built the kernel's table/tile_params, so XLA
    CSEs it inside fused step programs."""
    return tl.packed_fields(params, cfg.splat_bounds)


def _segment_grads(binning: tl.TileBinning, partial: jax.Array,
                   n_splats: int) -> GaussianParams:
    """Segment (n_tiles, 16, K) per-tile gradient partials onto the splat
    axis with ONE scatter-add (padded ids are -1 -> dropped)."""
    n_tiles, _, k = partial.shape
    rows = jnp.transpose(partial, (0, 2, 1)).reshape(n_tiles * k, N_GRAD_FIELDS)
    flat_ids = binning.ids.reshape(-1)
    acc = jnp.zeros((n_splats, N_GRAD_FIELDS), jnp.float32).at[flat_ids].add(
        rows, mode="drop")
    return GaussianParams(
        pos=acc[:, (G_PX, G_PY)],
        sx=acc[:, G_SX], sy=acc[:, G_SY], rot=acc[:, G_ROT],
        color=acc[:, (G_CR, G_CG, G_CB)],
        opacity=acc[:, G_OP],
    )


def l2_render_and_grads(
    binning: tl.TileBinning,
    ref_chw: jax.Array,
    n_splats: int,
    cfg: SplatConfig,
    params: GaussianParams,
    interpret: bool | None = None,
    band_row0=0,
    band_rows: int | None = None,
) -> Tuple[jax.Array, GaussianParams]:
    """Fused production train path for the L2 objective.

    ``ref_chw`` is the zero-padded (1, 3, Hp, Wp) target (pad once per fit,
    not per step). Returns (color (H, W, 3), parameter gradients).

    With ``band_row0`` (traced ok) / ``band_rows`` (static), the binning and
    the target cover only that band of tile rows (the tile-axis sharding
    unit); the returned color is the raw padded band (band_rows*tile_h, Wp,
    3), uncropped.

    Dispatches to the chunked variant when the per-tile capacity exceeds one
    chunk (keeps SMEM blocks and the one-hot gradient accumulator O(chunk)).
    """
    if interpret is None:
        interpret = _should_interpret()
    k = binning.ids.shape[1]
    if k > 256 and k % 256 == 0:
        return l2_render_and_grads_chunked(
            binning, ref_chw, n_splats, cfg, params, chunk=256,
            interpret=interpret, band_row0=band_row0, band_rows=band_rows)
    banded = band_rows is not None
    gy = band_rows if banded else cfg.n_tiles_y
    gx = cfg.n_tiles_x
    n_tiles = gy * gx
    th, tw = cfg.tile_h, cfg.tile_w
    hp = gy * th
    off = jnp.asarray([jnp.asarray(band_row0, jnp.int32) * th], jnp.int32)

    color, partial = pl.pallas_call(
        functools.partial(_l2_fused_kernel, cfg=cfg),
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, k, tl.N_FIELDS), lambda i, j, gx=gx: (i * gx + j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, th, tw), lambda i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, th, tw), lambda i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_GRAD_FIELDS, k), lambda i, j, gx=gx: (i * gx + j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 3, hp, cfg.padded_width), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, N_GRAD_FIELDS, k), jnp.float32),
        ],
        scratch_shapes=([pltpu.VMEM((k, th, tw), jnp.float32)]
                        if _use_gcache(cfg, k) else []),
        interpret=interpret,
    )(off, binning.count, binning.tile_params, ref_chw)

    grads = moments_to_grads(
        _segment_grads(binning, partial, n_splats), _fields_of(params, cfg))
    color = jnp.transpose(color[0], (1, 2, 0))
    if not banded:
        color = color[: cfg.height, : cfg.width]
    return color, grads


def pad_ref_chw(ref: jax.Array, cfg: SplatConfig) -> jax.Array:
    """Zero-pad an (H, W, 3) target to the (1, 3, Hp, Wp) kernel layout."""
    out = jnp.zeros((1, 3, cfg.padded_height, cfg.padded_width), jnp.float32)
    return out.at[0, :, : cfg.height, : cfg.width].set(
        jnp.transpose(jnp.asarray(ref, jnp.float32), (2, 0, 1)))


# ---------------------------------------------------------------------------
# Chunked fused L2 kernel: scales to arbitrary per-tile splat counts.
# ---------------------------------------------------------------------------

def _l2_chunked_kernel(off_ref, count_ref, params_ref, ref_ref,
                       color_ref, grads_ref, t_ref, ga1_ref, t1_ref,
                       *, cfg: SplatConfig, kc: int, n_chunks: int):
    """Grid (tiles, phase, chunk). Phase 0 composites the tile chunk by
    chunk; phase 1 replays for gradients. Per-pixel carries (T for the
    forward; the replay prefix ga1 = sum_ch gc*C_prefix plus T1 for the
    backward -- see _bwd_splat_step) live in output blocks revisited across
    the tile's consecutive grid steps, so VMEM and the one-hot accumulator
    stay O(chunk) no matter how long the splat list is. ``off_ref`` holds
    the global pixel row of the band's first row.
    """
    yy, xx, fy, fx, inside = _tile_coords_grid(cfg, pl.program_id(0),
                                               off_ref[0])
    th, tw = cfg.tile_h, cfg.tile_w
    phase = pl.program_id(1)
    chunk = pl.program_id(2)
    tile_idx = pl.program_id(0)
    n_live = count_ref[tile_idx] - chunk * kc  # remaining in this chunk
    n_here = jnp.clip(n_live, 0, kc)
    u = _unrolled(kc)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, kc), 1)
    zero = jnp.zeros((th, tw), jnp.float32)

    @pl.when((phase == 0) & (chunk == 0))
    def _():
        color_ref[0, 0] = zero
        color_ref[0, 1] = zero
        color_ref[0, 2] = zero
        t_ref[0] = inside.astype(jnp.float32)

    @pl.when((phase == 1) & (chunk == 0))
    def _():
        ga1_ref[0] = zero
        t1_ref[0] = inside.astype(jnp.float32)

    mt = jnp.float32(cfg.min_throughput)

    @pl.when(phase == 0)
    def _():
        # Chunk-level early exit: once every pixel of the tile is saturated
        # (T < 1/256 everywhere), later splats cannot contribute (the
        # vectorized form of the reference's per-pixel skip,
        # main.cpp:518-521). Whole remaining chunks are skipped.
        @pl.when(jnp.max(t_ref[0]) >= mt)
        def _():
            def step(k, carry):
                return _fwd_one(params_ref, k, fx, fy, xx, yy, inside, cfg,
                                carry)

            carry = (color_ref[0, 0], color_ref[0, 1], color_ref[0, 2],
                     t_ref[0])
            cr, cg, cb, T = _saturating_loop(
                n_here, u, step, carry, lambda c: c[3], mt, kc,
                saturating=_sat_walk(cfg))
            color_ref[0, 0] = cr
            color_ref[0, 1] = cg
            color_ref[0, 2] = cb
            t_ref[0] = T

    @pl.when(phase == 1)
    def _():
        # Fresh grads block every (tile, chunk) step: zero unconditionally so
        # a saturation-skipped chunk contributes exact zeros to the scatter.
        grads_ref[...] = jnp.zeros_like(grads_ref)

        @pl.when(jnp.max(t1_ref[0]) >= mt)
        def _():
            fin_rgb = (color_ref[0, 0], color_ref[0, 1], color_ref[0, 2])
            gc_rgb = (fin_rgb[0] - ref_ref[0, 0], fin_rgb[1] - ref_ref[0, 1],
                      fin_rgb[2] - ref_ref[0, 2])
            gf = (gc_rgb[0] * fin_rgb[0] + gc_rgb[1] * fin_rgb[1]
                  + gc_rgb[2] * fin_rgb[2])

            def step(k, carry):
                comp, gacc = carry
                comp, col = _bwd_splat_step(
                    params_ref, k, fx, fy, xx, yy, inside, cfg, comp,
                    gf, gc_rgb)
                oh = (lane == k).astype(jnp.float32)
                return comp, gacc + col * oh

            comp = (ga1_ref[0], t1_ref[0])
            (ga, T), gacc = _saturating_loop(
                n_here, u, step, (comp, jnp.zeros((9, kc), jnp.float32)),
                lambda c: c[0][1], mt, kc, saturating=_sat_walk(cfg))
            ga1_ref[0] = ga
            t1_ref[0] = T
            grads_ref[0] = jnp.concatenate(
                [gacc, jnp.zeros((N_GRAD_FIELDS - 9, kc), jnp.float32)],
                axis=0)


def _tile_coords_grid(cfg: SplatConfig, tile_idx, row0_px=0):
    """Pixel coords for a flat tile index (tiles iterate row-major);
    ``row0_px`` offsets rows into global coordinates for band rendering."""
    ti = tile_idx // cfg.n_tiles_x
    tj = tile_idx % cfg.n_tiles_x
    th, tw = cfg.tile_h, cfg.tile_w
    yy = row0_px + ti * th + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
    xx = tj * tw + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
    fy = yy.astype(jnp.float32) + jnp.float32(0.5)
    fx = xx.astype(jnp.float32) + jnp.float32(0.5)
    inside = (yy < cfg.height) & (xx < cfg.width)
    return yy, xx, fy, fx, inside


def l2_render_and_grads_chunked(
    binning: tl.TileBinning,
    ref_chw: jax.Array,
    n_splats: int,
    cfg: SplatConfig,
    params: GaussianParams,
    chunk: int = 256,
    interpret: bool | None = None,
    band_row0=0,
    band_rows: int | None = None,
) -> Tuple[jax.Array, GaussianParams]:
    """Chunked fused L2 path: constant VMEM/SMEM regardless of per-tile
    splat-list length. Same outputs as ``l2_render_and_grads`` (with band
    args, the raw padded band, uncropped)."""
    if interpret is None:
        interpret = _should_interpret()
    k = binning.ids.shape[1]
    kc = min(chunk, k)
    if k % kc:
        raise ValueError(f"per-tile capacity {k} must divide by chunk {kc}")
    n_chunks = k // kc
    banded = band_rows is not None
    gy = band_rows if banded else cfg.n_tiles_y
    gx = cfg.n_tiles_x
    n_tiles = gy * gx
    th, tw = cfg.tile_h, cfg.tile_w
    hp, wp = gy * th, cfg.padded_width
    off = jnp.asarray([jnp.asarray(band_row0, jnp.int32) * th], jnp.int32)

    grid = (n_tiles, 2, n_chunks)

    color, partial, _, _, _ = pl.pallas_call(
        functools.partial(_l2_chunked_kernel, cfg=cfg, kc=kc,
                          n_chunks=n_chunks),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, kc, tl.N_FIELDS), lambda t, p, c: (t, c, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, th, tw),
                         lambda t, p, c, gx=gx: (0, 0, t // gx, t % gx),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, th, tw),
                         lambda t, p, c, gx=gx: (0, 0, t // gx, t % gx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_GRAD_FIELDS, kc),
                         lambda t, p, c, n_chunks=n_chunks:
                         (t * n_chunks + c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw),
                         lambda t, p, c, gx=gx: (0, t // gx, t % gx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw),
                         lambda t, p, c, gx=gx: (0, t // gx, t % gx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw),
                         lambda t, p, c, gx=gx: (0, t // gx, t % gx),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 3, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * n_chunks, N_GRAD_FIELDS, kc),
                                 jnp.float32),
            jax.ShapeDtypeStruct((1, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((1, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((1, hp, wp), jnp.float32),
        ],
        interpret=interpret,
    )(off, binning.count, binning.tile_params, ref_chw)

    partial = partial.reshape(n_tiles, n_chunks, N_GRAD_FIELDS, kc)
    partial = jnp.transpose(partial, (0, 2, 1, 3)).reshape(
        n_tiles, N_GRAD_FIELDS, n_chunks * kc)
    grads = moments_to_grads(
        _segment_grads(binning, partial, n_splats), _fields_of(params, cfg))
    color = jnp.transpose(color[0], (1, 2, 0))
    if not banded:
        color = color[: cfg.height, : cfg.width]
    return color, grads
