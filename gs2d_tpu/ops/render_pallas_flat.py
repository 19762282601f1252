"""Rasterizer kernels over the flat block-aligned binning (large N).

Companion to ops/render_pallas.py, consuming ops/tiles_flat.py's layout:
the per-splat parameter rows of tile t live in whole kc-row blocks
``start[t]//kc + c`` of one flat (M, N_FIELDS) array, located via scalar
prefetch (pltpu.PrefetchScalarGridSpec) -- the Pallas-native form of a
variable-length segment walk. Gradients are written back to the same flat
blocks, so the final scatter onto the splat axis moves O(M) rows instead of
the dense path's O(n_tiles * K): at 1M splats that padding factor is the
dominant cost of the step (BASELINE.md).

Forward and backward are separate pallas_calls here (unlike the fused
single-kernel mini path): the flat layout targets scales where per-splat
parameter traffic, not per-image traffic, dominates -- and the splat-sharded
ordered-monoid combine needs a collective between the passes anyway.

Kernel math (_splat_terms / _fwd_one / _bwd_splat_step) is shared with
render_pallas.py; the reference loop semantics (bounds, early-out,
gradients -- main.cpp:418-712) are identical.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gs2d_tpu.config import SplatConfig
from gs2d_tpu.ops import tiles as tl
from gs2d_tpu.ops.render_pallas import (N_GRAD_FIELDS, _bwd_splat_step,
                                        _fwd_one, _sat_walk,
                                        _saturating_loop, _should_interpret,
                                        _tile_coords_grid, _unrolled)
from gs2d_tpu.ops.tiles_flat import FlatBinning
from gs2d_tpu.params import GaussianParams


# Binning-layout policy, measured on v5e at the production 32-row tiles
# with tuned capacities, scanned full-step ms/iter (BASELINE.md round-2
# crossover sweep):
#
#   N      dense   flat   resident
#   1k     1.32    1.31   1.07      (268x213)
#   2k     2.74    2.50   2.24      (535x426)
#   4k     5.39    4.53   4.39
#   8k    10.85    8.20   9.20
#
# resident wins up to 4k (no pregather/scatter; its one-hot expansion and
# SMEM table grow with N), flat wins from there (the original 8192
# threshold was measured at tile_h=8, where dense won below 10k). dense
# remains the fallback where the resident table cannot fit SMEM and the
# population is small, and under the sharded paths.
FLAT_THRESHOLD = 2048
RESIDENT_THRESHOLD = 4096
# v5e SMEM is 1 MiB (measured via the allocator report, see
# render_pallas_resident._TableView); leave headroom for count/scalars.
# Other TPU generations resolve through utils.hardware.resolve_budget
# (per-kind table / GS2D_SMEM_TABLE_BUDGET env override).
_RESIDENT_SMEM_BUDGET = 800 * 1024


def _resident_fits(cfg: SplatConfig) -> bool:
    """Conservative SMEM estimate for the resident kernel's whole-array
    inputs: the rank-1 packed table plus the (n_tiles, K) id matrix.

    The ids matrix is rank-2, and SMEM pads a rank-2 minor dim up to a
    multiple of 128 elements (measured v5e allocator behavior, CLAUDE.md),
    so its real footprint uses K rounded up to 128 -- without this, tuned
    K=64 configs near the budget auto-select resident and then fail SMEM
    allocation at compile time."""
    from gs2d_tpu.utils.hardware import resolve_budget

    k = cfg.max_splats_per_tile or min(max(256, cfg.n_splats // 4), 4096)
    k_padded = -(-k // 128) * 128
    table = 4 * tl.N_FIELDS * (cfg.n_splats + 1)
    ids = 4 * cfg.n_tiles_x * cfg.n_tiles_y * k_padded
    return table + ids <= resolve_budget("smem_table",
                                         _RESIDENT_SMEM_BUDGET)


def resolve_binning(cfg: SplatConfig) -> str:
    """Resolve cfg.binning to a concrete layout ("auto" picks by the
    measured population-size policy above)."""
    if cfg.binning in ("dense", "flat", "resident", "window"):
        return cfg.binning
    if cfg.binning != "auto":
        raise ValueError(f"unknown binning {cfg.binning!r}")
    from gs2d_tpu.utils.hardware import warn_if_untuned

    warn_if_untuned()  # thresholds + SMEM budget were measured on v5e
    if cfg.n_splats <= RESIDENT_THRESHOLD and _resident_fits(cfg):
        return "resident"
    if cfg.n_splats >= FLAT_THRESHOLD:
        return "flat"
    return "dense"


def use_flat(cfg: SplatConfig) -> bool:
    """True iff cfg resolves to the flat layout. The sharded paths (which
    implement dense and flat but not resident) must not consult this for
    the resident choice -- they pass binning="dense"/"flat"/"auto" and
    "auto" resolves to flat only at flat scales, so they stay correct."""
    return resolve_binning(cfg) == "flat"


def tune_flat_config(p: GaussianParams, cfg: SplatConfig,
                     margin: float = 1.5, n_bands: int = 1) -> SplatConfig:
    """Fill cfg.flat_capacity / flat_max_chunks from measured tile counts.

    ``n_bands`` sizes for per-device banded binning under tile-axis
    sharding (see tiles_flat.tune_flat_capacity).

    With lazy rebinning on (cfg.rebin_margin > 0) this also (a) sizes the
    tripwire slot grid: tiles.pairs_covered_by enumerates exact footprints
    on a max_tiles_per_splat grid and conservatively rebins EVERY step
    once any splat exceeds it -- a cap the flat layout itself deliberately
    doesn't have, so it must be measured, not defaulted; and (b) measures
    capacity with the margined footprints, so the superset binning the
    lazy cache builds can never overflow a capacity sized for margin 0."""
    from gs2d_tpu.ops.tiles_flat import tune_flat_capacity

    if cfg.rebin_margin > 0:
        cfg = tl.tune_max_tiles_per_splat(p, cfg)
    m, mc = tune_flat_capacity(p, cfg, kc=cfg.flat_chunk, margin=margin,
                               n_bands=n_bands, bin_margin=cfg.rebin_margin)
    return cfg.replace(flat_capacity=m, flat_max_chunks=mc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def production_render(params: GaussianParams, cfg: SplatConfig) -> jax.Array:
    """Differentiable rasterization on the PRODUCTION binning layout.

    Same custom-VJP contract as render_pallas.render (arbitrary upstream
    cotangent -> analytic Pallas backward), but dispatching dense / flat /
    resident per cfg.binning instead of always dense -- so perceptual
    heads (train/ssim.py) autodiffed on top run at production speed at
    every scale. Flat layouts need cfg.flat_capacity/flat_max_chunks set
    (tune_flat_config)."""
    color, _ = _prod_fwd(params, cfg)
    return color


def _prod_fwd(params: GaussianParams, cfg: SplatConfig):
    from gs2d_tpu.ops import render_pallas as rp
    from gs2d_tpu.ops import render_pallas_resident as rpr
    from gs2d_tpu.ops import tiles_flat as tlf

    n = params.pos.shape[0]
    if n != cfg.n_splats:
        raise ValueError(f"params hold {n} splats, cfg says {cfg.n_splats}")
    layout = resolve_binning(cfg)
    if layout == "flat":
        if cfg.flat_capacity is None or cfg.flat_max_chunks is None:
            raise ValueError("flat binning statics unset; call "
                             "tune_flat_config(params, cfg)")
        binning = tlf.bin_splats_flat(params, cfg, cfg.flat_capacity,
                                      kc=cfg.flat_chunk,
                                      max_chunks=cfg.flat_max_chunks)
        color_pad, _ = forward_flat(binning, cfg, cfg.flat_chunk,
                                    cfg.flat_max_chunks)
        color = color_pad[: cfg.height, : cfg.width]
        return color, (binning, color_pad, ())
    k = cfg.max_splats_per_tile or rp._max_per_tile(cfg)
    if layout == "resident":
        binning = tl.bin_splats(params, cfg, k, ids_only=True)
        table = rpr.resident_table(params, cfg)
        color, _ = rpr.forward_resident(binning, table, n, cfg)
        return color, (binning, color, table)
    binning = tl.bin_splats(params, cfg, k)
    color, _ = rp.forward_tiled(binning, cfg)
    return color, (binning, color, ())


def _prod_render_fwd(params, cfg):
    color, res = _prod_fwd(params, cfg)
    return color, (params,) + res


def _prod_render_bwd(cfg, res, g_color):
    from gs2d_tpu.ops import render_pallas as rp
    from gs2d_tpu.ops import render_pallas_resident as rpr

    params, binning, color, table = res
    n = cfg.n_splats
    layout = resolve_binning(cfg)
    if layout == "flat":
        hp, wp = color.shape[0], color.shape[1]
        g_pad = jnp.zeros((hp, wp, 3), jnp.float32).at[
            : cfg.height, : cfg.width].set(g_color)
        grads = backward_flat(binning, color, g_pad, n, cfg,
                              cfg.flat_chunk, cfg.flat_max_chunks,
                              params=params)
    elif layout == "resident":
        grads = rpr.backward_resident(binning, table, color, g_color, n, cfg)
    else:
        grads = rp.backward_tiled(binning, color, g_color, n, cfg, params)
    return (grads,)


production_render.defvjp(_prod_render_fwd, _prod_render_bwd)


def l2_step_flat(params: GaussianParams, ref_chw: jax.Array,
                 cfg: SplatConfig):
    """One flat-layout L2 render+grad evaluation using cfg's statics.

    Returns (color (H, W, 3), grads, n_dropped). cfg.flat_capacity and
    cfg.flat_max_chunks must be set (tune_flat_config)."""
    from gs2d_tpu.ops.tiles_flat import bin_splats_flat

    if cfg.flat_capacity is None or cfg.flat_max_chunks is None:
        raise ValueError(
            "flat binning statics unset; call tune_flat_config(params, cfg)")
    binning = bin_splats_flat(params, cfg, cfg.flat_capacity,
                              kc=cfg.flat_chunk,
                              max_chunks=cfg.flat_max_chunks)
    color, grads = l2_render_and_grads_flat(
        binning, ref_chw, params.pos.shape[0], cfg, cfg.flat_chunk,
        cfg.flat_max_chunks, params=params)
    return color, grads, binning.n_dropped


def _fwd_flat_kernel(off_ref, start_ref, count_ref, params_ref,
                     color_ref, trans_ref, *, cfg: SplatConfig, kc: int):
    t = pl.program_id(0)
    c = pl.program_id(1)
    yy, xx, fy, fx, inside = _tile_coords_grid(cfg, t, off_ref[0])
    th, tw = cfg.tile_h, cfg.tile_w
    zero = jnp.zeros((th, tw), jnp.float32)

    @pl.when(c == 0)
    def _():
        color_ref[0, 0] = zero
        color_ref[0, 1] = zero
        color_ref[0, 2] = zero
        trans_ref[0] = inside.astype(jnp.float32)

    n_here = jnp.clip(count_ref[t] - c * kc, 0, kc)
    u = _unrolled(kc)
    mt = jnp.float32(cfg.min_throughput)

    # Chunk-level early exit: a fully saturated tile (T < 1/256 everywhere,
    # the vectorized main.cpp:518-521 skip) skips remaining chunks whole.
    @pl.when((n_here > 0) & (jnp.max(trans_ref[0]) >= mt))
    def _():
        def step(k, carry):
            return _fwd_one(params_ref, k, fx, fy, xx, yy, inside, cfg,
                            carry)

        carry = (color_ref[0, 0], color_ref[0, 1], color_ref[0, 2],
                 trans_ref[0])
        cr, cg, cb, T = _saturating_loop(
            n_here, u, step, carry, lambda c: c[3], mt, kc,
            saturating=_sat_walk(cfg))
        color_ref[0, 0] = cr
        color_ref[0, 1] = cg
        color_ref[0, 2] = cb
        trans_ref[0] = T


def _bwd_flat_kernel(off_ref, start_ref, count_ref, params_ref, fin_ref,
                     gc_ref, cin_ref, tin_ref, grads_ref, ga1_ref, t1_ref,
                     *, cfg: SplatConfig, kc: int):
    t = pl.program_id(0)
    c = pl.program_id(1)
    yy, xx, fy, fx, inside = _tile_coords_grid(cfg, t, off_ref[0])
    th, tw = cfg.tile_h, cfg.tile_w
    gc_rgb = (gc_ref[0, 0], gc_ref[0, 1], gc_ref[0, 2])

    @pl.when(c == 0)
    def _():
        # Replay carry entering this tile: the cotangent-weighted prefix
        # ga = sum_ch gc*C_in of earlier splat shards' ordered-monoid
        # composite (identity when unsharded) -- see _bwd_splat_step.
        ga1_ref[0] = (gc_rgb[0] * cin_ref[0, 0]
                      + gc_rgb[1] * cin_ref[0, 1]
                      + gc_rgb[2] * cin_ref[0, 2])
        t1_ref[0] = tin_ref[0]

    n_here = jnp.clip(count_ref[t] - c * kc, 0, kc)
    nb = (count_ref[t] + kc - 1) // kc
    u = _unrolled(kc)
    mt = jnp.float32(cfg.min_throughput)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, kc), 1)

    # Only chunks mapped to a real flat block write gradients (others are
    # routed to the trash block by the index map and left untouched).
    @pl.when(c < nb)
    def _():
        grads_ref[...] = jnp.zeros_like(grads_ref)

        @pl.when(jnp.max(t1_ref[0]) >= mt)
        def _():
            gf = (gc_rgb[0] * fin_ref[0, 0] + gc_rgb[1] * fin_ref[0, 1]
                  + gc_rgb[2] * fin_ref[0, 2])

            def step(k, carry):
                comp, gacc = carry
                comp, col = _bwd_splat_step(
                    params_ref, k, fx, fy, xx, yy, inside, cfg, comp,
                    gf, gc_rgb)
                oh = (lane == k).astype(jnp.float32)
                return comp, gacc + col * oh

            comp0 = (ga1_ref[0], t1_ref[0])
            (ga, T), gacc = _saturating_loop(
                n_here, u, step, (comp0, jnp.zeros((9, kc), jnp.float32)),
                lambda c: c[0][1], mt, kc, saturating=_sat_walk(cfg))
            ga1_ref[0] = ga
            t1_ref[0] = T
            grads_ref[0] = jnp.concatenate(
                [gacc, jnp.zeros((N_GRAD_FIELDS - 9, kc), jnp.float32)],
                axis=0)


def forward_flat(
    binning: FlatBinning,
    cfg: SplatConfig,
    kc: int,
    max_chunks: int,
    interpret: bool | None = None,
    band_row0=0,
    band_rows: int | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Rasterize from a flat binning. Returns the raw padded
    (color (Hp, Wp, 3), T (Hp, Wp)) (band-shaped with band args).

    ``max_chunks`` is the static per-tile chunk cap the binning was built
    with (tiles_flat.tune_flat_capacity); it sizes the grid's chunk axis."""
    if interpret is None:
        interpret = _should_interpret()
    m = binning.rows.shape[0]
    m_blocks = m // kc
    gy = cfg.n_tiles_y if band_rows is None else band_rows
    gx = cfg.n_tiles_x
    n_tiles = gy * gx
    th, tw = cfg.tile_h, cfg.tile_w
    hp = gy * th
    off = jnp.asarray([jnp.asarray(band_row0, jnp.int32) * th], jnp.int32)
    start_blocks = binning.start // kc
    params3 = binning.rows.reshape(m_blocks, kc, tl.N_FIELDS)

    def params_idx(t, c, off_r, start_r, count_r):
        nb = jnp.maximum((count_r[t] + kc - 1) // kc, 1)
        b = start_r[t] + jnp.minimum(c, nb - 1)
        return (jnp.minimum(b, m_blocks - 1), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles, max_chunks),
        in_specs=[
            pl.BlockSpec((1, kc, tl.N_FIELDS), params_idx,
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, th, tw),
                         lambda t, c, *_, gx=gx: (0, 0, t // gx, t % gx)),
            pl.BlockSpec((1, th, tw),
                         lambda t, c, *_, gx=gx: (0, t // gx, t % gx)),
        ],
    )
    color, trans = pl.pallas_call(
        functools.partial(_fwd_flat_kernel, cfg=cfg, kc=kc),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, 3, hp, cfg.padded_width), jnp.float32),
            jax.ShapeDtypeStruct((1, hp, cfg.padded_width), jnp.float32),
        ],
        interpret=interpret,
    )(off, start_blocks, binning.count, params3)
    return jnp.transpose(color[0], (1, 2, 0)), trans[0]


def backward_flat(
    binning: FlatBinning,
    final_color: jax.Array,
    g_color: jax.Array,
    n_splats: int,
    cfg: SplatConfig,
    kc: int,
    max_chunks: int,
    params: GaussianParams,
    carry_in=None,
    interpret: bool | None = None,
    band_row0=0,
    band_rows: int | None = None,
) -> GaussianParams:
    """Analytic gradients from a flat binning + upstream cotangent.

    ``final_color``/``g_color`` are padded (Hp, Wp, 3) (band-shaped with
    band args); ``carry_in`` the (C, T) monoid prefix entering this splat
    shard (identity when None). One scatter-add of M rows segments the
    per-pair gradient rows onto the splat axis.
    """
    if interpret is None:
        interpret = _should_interpret()
    m = binning.rows.shape[0]
    m_blocks = m // kc
    gy = cfg.n_tiles_y if band_rows is None else band_rows
    gx = cfg.n_tiles_x
    n_tiles = gy * gx
    th, tw = cfg.tile_h, cfg.tile_w
    hp = gy * th
    wp = cfg.padded_width
    off = jnp.asarray([jnp.asarray(band_row0, jnp.int32) * th], jnp.int32)
    start_blocks = binning.start // kc

    def chw(img):
        return jnp.transpose(img, (2, 0, 1))[None]

    fin = chw(final_color)
    gc = chw(g_color)
    if carry_in is None:
        from gs2d_tpu.ops.render_pallas import identity_trans

        c_in = jnp.zeros((1, 3, hp, wp), jnp.float32)
        t_in = identity_trans(cfg, hp, wp, off[0])[None]
    else:
        c_in = chw(carry_in[0])
        t_in = carry_in[1][None]

    def params_idx(t, c, off_r, start_r, count_r):
        nb = jnp.maximum((count_r[t] + kc - 1) // kc, 1)
        b = start_r[t] + jnp.minimum(c, nb - 1)
        return (jnp.minimum(b, m_blocks - 1), 0, 0)

    def grads_idx(t, c, off_r, start_r, count_r):
        nb = (count_r[t] + kc - 1) // kc
        # Unmapped steps write nothing; route them to the trailing trash
        # block so real blocks are each owned by exactly one (tile, chunk).
        return (jnp.where(c < nb, start_r[t] + c, m_blocks), 0, 0)

    def tile_idx4(t, c, *_, gx=gx):
        return (0, 0, t // gx, t % gx)

    def tile_idx3(t, c, *_, gx=gx):
        return (0, t // gx, t % gx)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles, max_chunks),
        in_specs=[
            pl.BlockSpec((1, kc, tl.N_FIELDS), params_idx,
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, th, tw), tile_idx4),
            pl.BlockSpec((1, 3, th, tw), tile_idx4),
            pl.BlockSpec((1, 3, th, tw), tile_idx4),
            pl.BlockSpec((1, th, tw), tile_idx3),
        ],
        out_specs=[
            pl.BlockSpec((1, N_GRAD_FIELDS, kc), grads_idx),
            pl.BlockSpec((1, th, tw), tile_idx3),
            pl.BlockSpec((1, th, tw), tile_idx3),
        ],
    )
    partial, _, _ = pl.pallas_call(
        functools.partial(_bwd_flat_kernel, cfg=cfg, kc=kc),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m_blocks + 1, N_GRAD_FIELDS, kc),
                                 jnp.float32),
            jax.ShapeDtypeStruct((1, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((1, hp, wp), jnp.float32),
        ],
        interpret=interpret,
    )(off, start_blocks, binning.count, binning.rows.reshape(
        m_blocks, kc, tl.N_FIELDS), fin, gc, c_in, t_in)

    from gs2d_tpu.ops.render_pallas import _fields_of, moments_to_grads
    return moments_to_grads(
        _segment_grads_flat(binning, partial[:m_blocks], n_splats),
        _fields_of(params, cfg))


def _segment_grads_flat(binning: FlatBinning, partial: jax.Array,
                        n_splats: int) -> GaussianParams:
    """One scatter-add of the M flat per-pair gradient rows (ids -1 drop)."""
    from gs2d_tpu.ops.render_pallas import (G_CB, G_CG, G_CR, G_OP, G_PX,
                                            G_PY, G_ROT, G_SX, G_SY)

    m_blocks, _, kc = partial.shape
    rows = jnp.transpose(partial, (0, 2, 1)).reshape(
        m_blocks * kc, N_GRAD_FIELDS)
    # Padding rows use a *positive* out-of-bounds index: flat blocks no grid
    # step mapped are uninitialized (garbage, possibly NaN), and a -1 id
    # would wrap to splat n-1 instead of dropping.
    ids = jnp.where(binning.ids >= 0, binning.ids, jnp.int32(n_splats))
    acc = jnp.zeros((n_splats, N_GRAD_FIELDS), jnp.float32).at[
        ids].add(rows, mode="drop")
    return GaussianParams(
        pos=acc[:, (G_PX, G_PY)],
        sx=acc[:, G_SX], sy=acc[:, G_SY], rot=acc[:, G_ROT],
        color=acc[:, (G_CR, G_CG, G_CB)],
        opacity=acc[:, G_OP],
    )


def l2_render_and_grads_flat(
    binning: FlatBinning,
    ref_chw: jax.Array,
    n_splats: int,
    cfg: SplatConfig,
    kc: int,
    max_chunks: int,
    params: GaussianParams,
    interpret: bool | None = None,
    band_row0=0,
    band_rows: int | None = None,
) -> Tuple[jax.Array, GaussianParams]:
    """Flat-layout L2 train path: forward, cotangent, backward, scatter.

    Same contract as render_pallas.l2_render_and_grads: ``ref_chw`` is the
    padded (1, 3, Hp, Wp) target (band-shaped slice with band args); returns
    (color cropped to the image -- or the raw band -- and param grads).
    """
    banded = band_rows is not None
    color_p, _ = forward_flat(binning, cfg, kc, max_chunks,
                              interpret=interpret,
                              band_row0=band_row0, band_rows=band_rows)
    ref_hwc = jnp.transpose(ref_chw[0], (1, 2, 0))
    gC = color_p - ref_hwc  # reference dL/dC (main.cpp:616); 0 on padding
    grads = backward_flat(binning, color_p, gC, n_splats, cfg, kc,
                          max_chunks, params=params, interpret=interpret,
                          band_row0=band_row0, band_rows=band_rows)
    color = color_p if banded else color_p[: cfg.height, : cfg.width]
    return color, grads
