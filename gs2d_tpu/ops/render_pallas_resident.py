"""Resident-population fused L2 kernel for small splat counts.

The dense path (render_pallas.py) pays two O(n_tiles * K) per-row costs
outside the kernel every iteration: the packed-parameter pregather
(``tiles.bin_splats`` gathers one 64-byte row per (tile, slot)) and the
gradient scatter (``_segment_grads`` scatter-adds one row per (tile, slot)
back onto the splat axis). The TPU gather/scatter unit pays per ROW, not
per byte (CLAUDE.md), so at small populations those two moves rival the
rasterization kernel itself.

This variant removes both for populations whose whole parameter table fits
in SMEM:

- Binning produces only the per-tile id lists (``bin_splats(ids_only=)``) --
  no parameter pregather. The kernel holds the full (N+1, N_FIELDS) packed
  table in SMEM and fetches each listed splat's scalars by id through a
  view adapter (``_TableView``), so the shared kernel math
  (render_pallas._splat_terms / _fwd_one / _bwd_splat_step -- the exact
  reference semantics, main.cpp:418-712) is reused untouched. Row N of the
  table is the benign pad row; padded slots are remapped to it outside the
  kernel (ids -1 -> N), making overhang slots numerical no-ops exactly like
  the dense path's pad_vals.
- Gradients accumulate into a single resident (16, n_pad) VMEM output
  block that every grid step revisits: each tile reduces its per-slot
  gradient columns (9, K) like the dense kernel, then expands them onto the
  splat axis inside the kernel with a one-hot MXU matmul
  (gacc (9, K) @ onehot (K, n_pad)) -- a splat appears at most once per
  tile list, so every (slot -> splat) product is exact and the sum has no
  duplicate-index ambiguity. No XLA scatter remains in the step.

The layout targets the reference's own default workload scale (1024 splats,
main.cpp:271): SMEM is the limit (the table is 64 KB at 1k, 16 B * N + 16
per row), and the one-hot expansion is O(K * n_pad) vector ops per tile,
both of which grow linearly with N -- large populations want the flat
layout (render_pallas_flat.py) instead.
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
from gs2d_tpu.ops.render_pallas import (moments_to_grads,
                                        G_CB, G_CG, G_CR, G_OP, G_PX, G_PY,
                                        G_ROT, G_SX, G_SY, N_GRAD_FIELDS,
                                        _bwd_splat_step, _bwd_splat_step_cached,
                                        _fwd_one, _saturating_loop,
                                        _should_interpret, _tile_coords,
                                        _unrolled, _use_gcache)
from gs2d_tpu.params import GaussianParams


class _TableView:
    """Adapter making (table_ref, ids_ref[t]) index like the dense kernels'
    (1, K, N_FIELDS) SMEM parameter block: view[0, k, i] reads field i of
    the splat listed in slot k of tile ``t`` (ids pre-remapped, -1 -> the
    benign row N).

    ``ids_ref`` is the whole (n_tiles, K) id matrix in SMEM; ``table_ref``
    is the packed table FLATTENED to rank-1 ((N+1)*N_FIELDS,): SMEM pads a
    rank-2 array's minor dimension to 128 elements (measured on v5e via
    the allocator's 'window f32[2049,16] = u8[1052672]' report -- 8x waste
    on 16-wide rows, which blew the 1 MiB SMEM at 2k splats), while a
    rank-1 array packs densely."""

    def __init__(self, table_ref, ids_ref, t):
        self._table = table_ref
        self._ids = ids_ref
        self._t = t

    def __getitem__(self, idx):
        _, k, i = idx
        return self._table[self._ids[self._t, k] * tl.N_FIELDS + i]

    @property
    def shape(self):
        # (1, K, N_FIELDS), the dense block shape the callers introspect.
        return (1,) + self._ids.shape[1:] + (tl.N_FIELDS,)


def _l2_resident_kernel(off_ref, count_ref, table_ref, ids_ref, idc_ref,
                        ref_ref, color_ref, grads_ref, gcache_ref=None,
                        *, cfg: SplatConfig, n_pad: int):
    """Fused L2 forward + cotangent + backward with a resident parameter
    table (SMEM) and a resident gradient accumulator (VMEM, revisited by
    every grid step). Mirrors render_pallas._l2_fused_kernel otherwise;
    ``off_ref`` holds the band's first global pixel row (0 unbanded)."""
    yy, xx, fy, fx, inside = _tile_coords(cfg, off_ref[0])
    th, tw = cfg.tile_h, cfg.tile_w
    i_t = pl.program_id(0)
    j_t = pl.program_id(1)
    t_flat = i_t * cfg.n_tiles_x + j_t
    n_live = count_ref[t_flat]
    view = _TableView(table_ref, ids_ref, t_flat)
    k_cap = ids_ref.shape[1]
    u = _unrolled(k_cap)

    @pl.when((i_t == 0) & (j_t == 0))
    def _():
        grads_ref[...] = jnp.zeros_like(grads_ref)

    # ---- pass 1: forward composite --------------------------------------
    mt = jnp.float32(cfg.min_throughput)

    def fwd_step(k, carry):
        return _fwd_one(view, k, fx, fy, xx, yy, inside, cfg, carry,
                        gcache_ref)

    zero = jnp.zeros((th, tw), jnp.float32)
    t0 = inside.astype(jnp.float32)
    fin_r, fin_g, fin_b, _ = _saturating_loop(
        n_live, u, fwd_step, (zero, zero, zero, t0), lambda c: c[3], mt,
        k_cap, saturating=False)
    color_ref[0, 0] = fin_r
    color_ref[0, 1] = fin_g
    color_ref[0, 2] = fin_b

    gc_rgb = (fin_r - ref_ref[0, 0], fin_g - ref_ref[0, 1],
              fin_b - ref_ref[0, 2])
    gf = gc_rgb[0] * fin_r + gc_rgb[1] * fin_g + gc_rgb[2] * fin_b

    # ---- pass 2: backward replay ----------------------------------------
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k_cap), 1)

    def bwd_step(k, carry):
        comp, gacc = carry
        if gcache_ref is not None:
            comp, col = _bwd_splat_step_cached(
                view, k, fx, fy, cfg, comp, gf, gc_rgb, gcache_ref)
        else:
            comp, col = _bwd_splat_step(view, k, fx, fy, xx, yy, inside,
                                        cfg, comp, gf, gc_rgb)
        oh = (lane == k).astype(jnp.float32)
        return comp, gacc + col * oh

    comp0 = (zero, t0)
    _, gacc = _saturating_loop(
        n_live, u, bwd_step, (comp0, jnp.zeros((9, k_cap), jnp.float32)),
        lambda c: c[0][1], mt, k_cap, saturating=False)

    # Expand the per-slot columns onto the splat axis on the MXU: slot k of
    # this tile contributes to exactly splat ids[k] (a splat appears at most
    # once per tile list), so the one-hot products and row sums are exact.
    # Remapped pad ids (N) match either no lane or a lane >= N that the
    # caller slices away.
    onehot = (idc_ref[0] == jax.lax.broadcasted_iota(
        jnp.int32, (k_cap, n_pad), 1)).astype(jnp.float32)
    contrib = jax.lax.dot_general(
        gacc, onehot, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    grads_ref[...] = grads_ref[...] + jnp.concatenate(
        [contrib, jnp.zeros((N_GRAD_FIELDS - 9, n_pad), jnp.float32)],
        axis=0)


def resident_table(params: GaussianParams, cfg: SplatConfig) -> jax.Array:
    """((N+1) * N_FIELDS,) packed parameter rows + the benign pad row,
    flattened to rank-1 for dense SMEM packing (see _TableView)."""
    rows = jnp.transpose(tl.packed_fields(params, cfg.splat_bounds))
    pad = jnp.zeros((1, tl.N_FIELDS), jnp.float32)
    pad = pad.at[0, jnp.array([tl.FIELD_A, tl.FIELD_D, tl.FIELD_SX,
                               tl.FIELD_SY, tl.FIELD_COS])].set(1.0)
    pad = pad.at[0, tl.FIELD_H].set(-1.0)
    return jnp.concatenate([rows, pad], axis=0).reshape(-1)


def _unpack_grads(grads16: jax.Array, n_splats: int) -> GaussianParams:
    """(16, n_pad) resident moment rows -> GaussianParams-shaped carrier
    (raw z-moments; see render_pallas.moments_to_grads)."""
    g = grads16[:, :n_splats]
    return GaussianParams(
        pos=jnp.stack([g[G_PX], g[G_PY]], axis=-1),
        sx=g[G_SX], sy=g[G_SY], rot=g[G_ROT],
        color=jnp.stack([g[G_CR], g[G_CG], g[G_CB]], axis=-1),
        opacity=g[G_OP],
    )


def _table_fields(table: jax.Array, n_splats: int) -> jax.Array:
    """(N_FIELDS, n) combination coefficients for moments_to_grads,
    recovered from the packed resident table (bitwise the kernel's values;
    the reshape/transpose undoes resident_table's packing)."""
    return jnp.transpose(table.reshape(-1, tl.N_FIELDS)[:n_splats])


def _remap_ids(binning: tl.TileBinning, n_splats: int):
    """ids with -1 remapped to the benign table row N, plus the per-tile
    column form the one-hot expansion consumes."""
    ids_s = jnp.where(binning.ids >= 0, binning.ids,
                      jnp.int32(n_splats)).astype(jnp.int32)
    return ids_s, ids_s[:, :, None]


def l2_render_and_grads_resident(
    binning: tl.TileBinning,
    table: jax.Array,
    ref_chw: jax.Array,
    n_splats: int,
    cfg: SplatConfig,
    interpret: bool | None = None,
    band_row0=0,
    band_rows: int | None = None,
) -> Tuple[jax.Array, GaussianParams]:
    """Resident-table fused L2 train path (same contract as
    render_pallas.l2_render_and_grads; with band args the binning and
    target cover one band of tile rows and the returned color is the raw
    padded band).

    ``binning`` may be ids-only (bin_splats(ids_only=True)); ``table`` is
    resident_table(params, cfg)."""
    if interpret is None:
        interpret = _should_interpret()
    k = binning.ids.shape[1]
    banded = band_rows is not None
    gy = band_rows if banded else cfg.n_tiles_y
    gx = cfg.n_tiles_x
    th, tw = cfg.tile_h, cfg.tile_w
    hp = gy * th
    n_pad = -(-n_splats // 128) * 128
    off = jnp.asarray([jnp.asarray(band_row0, jnp.int32) * th], jnp.int32)
    ids_s, idc = _remap_ids(binning, n_splats)

    color, grads16 = pl.pallas_call(
        functools.partial(_l2_resident_kernel, cfg=cfg, n_pad=n_pad),
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # band offset
            pl.BlockSpec(memory_space=pltpu.SMEM),   # count (whole)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # table (whole)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ids (whole)
            pl.BlockSpec((1, k, 1), lambda i, j, gx=gx: (i * gx + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, th, tw), lambda i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, th, tw), lambda i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_GRAD_FIELDS, n_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 3, hp, cfg.padded_width), jnp.float32),
            jax.ShapeDtypeStruct((N_GRAD_FIELDS, n_pad), jnp.float32),
        ],
        scratch_shapes=([pltpu.VMEM((k, th, tw), jnp.float32)]
                        if _use_gcache(cfg, k) else []),
        interpret=interpret,
    )(off, binning.count, table, ids_s, idc, ref_chw)

    grads = moments_to_grads(_unpack_grads(grads16, n_splats),
                             _table_fields(table, n_splats))
    color = jnp.transpose(color[0], (1, 2, 0))
    if not banded:
        color = color[: cfg.height, : cfg.width]
    return color, grads


def _fwd_resident_kernel(off_ref, count_ref, table_ref, ids_ref,
                         color_ref, trans_ref, *, cfg: SplatConfig):
    """Modular resident forward: per-shard partial (C, T) for the ordered
    monoid (render_pallas._forward_kernel with the table view)."""
    yy, xx, fy, fx, inside = _tile_coords(cfg, off_ref[0])
    th, tw = cfg.tile_h, cfg.tile_w
    i_t = pl.program_id(0)
    j_t = pl.program_id(1)
    t_flat = i_t * cfg.n_tiles_x + j_t
    n_live = count_ref[t_flat]
    view = _TableView(table_ref, ids_ref, t_flat)
    u = _unrolled(ids_ref.shape[1])

    def step(k, carry):
        return _fwd_one(view, k, fx, fy, xx, yy, inside, cfg, carry)

    zero = jnp.zeros((th, tw), jnp.float32)
    cr, cg, cb, T = _saturating_loop(
        n_live, u, step, (zero, zero, zero, inside.astype(jnp.float32)),
        lambda c: c[3], jnp.float32(cfg.min_throughput),
        ids_ref.shape[1], saturating=False)
    color_ref[0, 0] = cr
    color_ref[0, 1] = cg
    color_ref[0, 2] = cb
    trans_ref[0] = T


def _bwd_resident_kernel(off_ref, count_ref, table_ref, ids_ref, idc_ref,
                         fin_ref, gc_ref, c_in_ref, t_in_ref, grads_ref,
                         *, cfg: SplatConfig, n_pad: int):
    """Modular resident backward: replay from the ordered-monoid prefix
    (c_in, t_in), gradients expanded onto the splat axis in-kernel (the
    one-hot MXU matmul) into the resident (16, n_pad) accumulator."""
    yy, xx, fy, fx, inside = _tile_coords(cfg, off_ref[0])
    i_t = pl.program_id(0)
    j_t = pl.program_id(1)
    t_flat = i_t * cfg.n_tiles_x + j_t
    n_live = count_ref[t_flat]
    view = _TableView(table_ref, ids_ref, t_flat)
    k_cap = ids_ref.shape[1]
    u = _unrolled(k_cap)

    @pl.when((i_t == 0) & (j_t == 0))
    def _():
        grads_ref[...] = jnp.zeros_like(grads_ref)

    gc_rgb = (gc_ref[0, 0], gc_ref[0, 1], gc_ref[0, 2])
    gf = (gc_rgb[0] * fin_ref[0, 0] + gc_rgb[1] * fin_ref[0, 1]
          + gc_rgb[2] * fin_ref[0, 2])
    ga0 = (gc_rgb[0] * c_in_ref[0, 0] + gc_rgb[1] * c_in_ref[0, 1]
           + gc_rgb[2] * c_in_ref[0, 2])
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k_cap), 1)

    def step(k, carry):
        comp, gacc = carry
        comp, col = _bwd_splat_step(view, k, fx, fy, xx, yy, inside,
                                    cfg, comp, gf, gc_rgb)
        oh = (lane == k).astype(jnp.float32)
        return comp, gacc + col * oh

    comp0 = (ga0, t_in_ref[0])
    _, gacc = _saturating_loop(
        n_live, u, step, (comp0, jnp.zeros((9, k_cap), jnp.float32)),
        lambda c: c[0][1], jnp.float32(cfg.min_throughput), k_cap,
        saturating=False)

    onehot = (idc_ref[0] == jax.lax.broadcasted_iota(
        jnp.int32, (k_cap, n_pad), 1)).astype(jnp.float32)
    contrib = jax.lax.dot_general(
        gacc, onehot, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    grads_ref[...] = grads_ref[...] + jnp.concatenate(
        [contrib, jnp.zeros((N_GRAD_FIELDS - 9, n_pad), jnp.float32)],
        axis=0)


def forward_resident(
    binning: tl.TileBinning,
    table: jax.Array,
    n_splats: int,
    cfg: SplatConfig,
    interpret: bool | None = None,
    band_row0=0,
    band_rows: int | None = None,
    crop: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Resident forward pass; same contract as render_pallas.forward_tiled
    (band args give the raw padded band; crop applies only unbanded)."""
    if interpret is None:
        interpret = _should_interpret()
    banded = band_rows is not None
    gy = band_rows if banded else cfg.n_tiles_y
    gx = cfg.n_tiles_x
    th, tw = cfg.tile_h, cfg.tile_w
    hp = gy * th
    off = jnp.asarray([jnp.asarray(band_row0, jnp.int32) * th], jnp.int32)
    ids_s, _ = _remap_ids(binning, n_splats)

    color, trans = pl.pallas_call(
        functools.partial(_fwd_resident_kernel, cfg=cfg),
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, th, tw), lambda i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 3, hp, cfg.padded_width), jnp.float32),
            jax.ShapeDtypeStruct((1, hp, cfg.padded_width), jnp.float32),
        ],
        interpret=interpret,
    )(off, binning.count, table, ids_s)
    color = jnp.transpose(color[0], (1, 2, 0))
    trans = trans[0]
    if crop and not banded:
        return (color[: cfg.height, : cfg.width],
                trans[: cfg.height, : cfg.width])
    return color, trans


def backward_resident(
    binning: tl.TileBinning,
    table: jax.Array,
    final_color: jax.Array,
    g_color: jax.Array,
    n_splats: int,
    cfg: SplatConfig,
    carry_in=None,
    interpret: bool | None = None,
    band_row0=0,
    band_rows: int | None = None,
) -> GaussianParams:
    """Resident backward pass; same contract as
    render_pallas.backward_tiled (carry_in = the ordered-monoid (C, T)
    prefix entering this splat shard; identity when None)."""
    if interpret is None:
        interpret = _should_interpret()
    from gs2d_tpu.ops.render_pallas import identity_trans

    k = binning.ids.shape[1]
    banded = band_rows is not None
    gy = band_rows if banded else cfg.n_tiles_y
    gx = cfg.n_tiles_x
    th, tw = cfg.tile_h, cfg.tile_w
    hp = gy * th
    wp = cfg.padded_width
    n_pad = -(-n_splats // 128) * 128
    off = jnp.asarray([jnp.asarray(band_row0, jnp.int32) * th], jnp.int32)
    ids_s, idc = _remap_ids(binning, n_splats)

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

    def tile4(i, j):
        return (0, 0, i, j)

    def tile3(i, j):
        return (0, i, j)

    grads16 = pl.pallas_call(
        functools.partial(_bwd_resident_kernel, cfg=cfg, n_pad=n_pad),
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, k, 1), lambda i, j, gx=gx: (i * gx + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, th, tw), tile4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, th, tw), tile4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, th, tw), tile4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw), tile3, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N_GRAD_FIELDS, n_pad), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_GRAD_FIELDS, n_pad), jnp.float32),
        interpret=interpret,
    )(off, binning.count, table, ids_s, idc, fin, gc, c_in, t_in)

    return moments_to_grads(_unpack_grads(grads16, n_splats),
                            _table_fields(table, n_splats))


def l2_step_resident(params: GaussianParams, ref_chw: jax.Array,
                     cfg: SplatConfig, max_per_tile: int):
    """One resident-path L2 evaluation: ids-only binning + fused kernel.

    Returns (color (H, W, 3), grads, n_dropped)."""
    binning = tl.bin_splats(params, cfg, max_per_tile, ids_only=True)
    table = resident_table(params, cfg)
    color, grads = l2_render_and_grads_resident(
        binning, table, ref_chw, params.pos.shape[0], cfg)
    return color, grads, binning.n_dropped
