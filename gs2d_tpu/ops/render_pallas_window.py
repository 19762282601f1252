"""Windowed-expansion resident kernel: the 8k-splat crossover experiment.

The resident layout (render_pallas_resident.py) eliminates the dense
path's per-row pregather/scatter but pays an O(K * n_pad) in-kernel cost
per tile to expand the per-slot gradient columns onto the splat axis (the
one-hot construction plus the (9, K) @ (K, n_pad) MXU matmul). At the
reference workload (1k splats) that term is small; at 8k (n_pad = 8192)
it is the measured ~1 ms/step that makes resident lose to flat
(BASELINE.md crossover table: 9.20 vs 8.20 ms).

This variant shrinks the expansion from n_pad to a static per-tile WINDOW
of the splat axis. Per-tile id lists are ascending (the compositing-order
contract), so after a Morton reorder (train/reorder.py) the ids binned to
one tile span a compact range: the kernel expands slot columns onto
[base_t, base_t + W) only (W = cfg.window_width, tuned from measured
spans), writes one (16, W) window block per tile, and a cheap
block-granularity scatter-add outside the kernel places the n_tiles
windows onto the (16, n_pad) gradient rows -- O(n_tiles * W/128) moved
rows, vs the dense path's O(n_tiles * K).

Windows are a *capacity static* like every other binning capacity here:
ids outside a tile's window would lose their gradient contribution
(forward is unaffected -- the table fetch is windowless), so they are
counted (``n_escaped``) and surfaced through the step's n_dropped channel;
"overflow is never silent" (ops/tiles.py). ``tune_window`` sizes W from
the measured spans with margin; populations without spatial index
locality (e.g. freshly initialized, never reordered) tune to W = n_pad,
degenerating exactly into the plain resident kernel.

Kernel math (_fwd_one / _bwd_splat_step via the SMEM table view) is shared
with render_pallas_resident.py; reference loop semantics (bounds,
early-out, gradients -- main.cpp:418-712) are identical.
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
                                        _fwd_one, _saturating_loop,
                                        _should_interpret, _tile_coords,
                                        _unrolled)
from gs2d_tpu.ops.render_pallas_resident import (_TableView, _remap_ids,
                                                 _unpack_grads,
                                                 resident_table)
from gs2d_tpu.params import GaussianParams


def _n_pad(n_splats: int) -> int:
    return -(-n_splats // 128) * 128


def window_bases(binning: tl.TileBinning, n_splats: int,
                 width: int) -> Tuple[jax.Array, jax.Array]:
    """Per-tile window bases and the escaped-pair count.

    base_t = the first live id's 128-block, clipped so the window stays
    inside [0, n_pad); after the clip-down every live id is >= base_t, so
    escapes happen only past the top edge. Returns (bases (n_tiles,) i32,
    n_escaped () i32 -- live pairs whose gradient the window would lose).
    """
    ids = binning.ids.reshape(-1, binning.ids.shape[-1])
    live = ids >= 0
    np_ = _n_pad(n_splats)
    min_id = jnp.min(jnp.where(live, ids, jnp.int32(n_splats)), axis=1)
    base = jnp.clip((min_id // 128) * 128, 0, max(np_ - width, 0))
    escaped = jnp.sum((live & (ids >= base[:, None] + width)).astype(
        jnp.int32))
    return base.astype(jnp.int32), escaped


def measure_window_span(binning: tl.TileBinning, n_splats: int) -> jax.Array:
    """Max over tiles of (last live id - first live id's 128-block + 1):
    the smallest W (before rounding) that loses nothing on this binning."""
    ids = binning.ids.reshape(-1, binning.ids.shape[-1])
    live = ids >= 0
    min_id = jnp.min(jnp.where(live, ids, jnp.int32(n_splats)), axis=1)
    max_id = jnp.max(jnp.where(live, ids, jnp.int32(-1)), axis=1)
    span = jnp.where(max_id >= 0, max_id - (min_id // 128) * 128 + 1, 0)
    return jnp.max(span)


def tune_window(p: GaussianParams, cfg: SplatConfig,
                margin_blocks: int = 2) -> SplatConfig:
    """Fill cfg.window_width from the measured per-tile id spans.

    Sizes W = ceil(max span / 128) * 128 + margin_blocks * 128 (slack for
    drift between retunes), capped at n_pad (where the kernel degenerates
    into the plain resident expansion). Call after a Morton reorder
    (train/reorder.py) -- spans on an unordered population tune to n_pad.
    """
    k = cfg.max_splats_per_tile
    if k is None:
        from gs2d_tpu.ops import render_pallas as rp

        k = rp._max_per_tile(cfg)
    binning = tl.bin_splats(p, cfg, k, ids_only=True)
    span = int(jax.device_get(measure_window_span(binning, cfg.n_splats)))
    np_ = _n_pad(cfg.n_splats)
    w = min(-(-span // 128) * 128 + margin_blocks * 128, np_)
    return cfg.replace(window_width=w)


def _l2_window_kernel(off_ref, count_ref, base_ref, table_ref, ids_ref,
                      idc_ref, ref_ref, color_ref, win_ref, *,
                      cfg: SplatConfig, width: int):
    """Fused L2 forward + cotangent + backward; per-slot gradient columns
    expanded onto this tile's [base, base + width) splat-axis window and
    written to the tile's own output block (no resident accumulator, no
    revisits). Mirrors render_pallas_resident._l2_resident_kernel
    otherwise."""
    yy, xx, fy, fx, inside = _tile_coords(cfg, off_ref[0])
    th, tw = cfg.tile_h, cfg.tile_w
    i_t = pl.program_id(0)
    j_t = pl.program_id(1)
    t_flat = i_t * cfg.n_tiles_x + j_t
    n_live = count_ref[t_flat]
    base = base_ref[t_flat]
    view = _TableView(table_ref, ids_ref, t_flat)
    k_cap = ids_ref.shape[1]
    u = _unrolled(k_cap)

    # ---- pass 1: forward composite --------------------------------------
    mt = jnp.float32(cfg.min_throughput)

    def fwd_step(k, carry):
        return _fwd_one(view, k, fx, fy, xx, yy, inside, cfg, carry)

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
        comp, col = _bwd_splat_step(view, k, fx, fy, xx, yy, inside,
                                    cfg, comp, gf, gc_rgb)
        oh = (lane == k).astype(jnp.float32)
        return comp, gacc + col * oh

    comp0 = (zero, t0)
    _, gacc = _saturating_loop(
        n_live, u, bwd_step, (comp0, jnp.zeros((9, k_cap), jnp.float32)),
        lambda c: c[0][1], mt, k_cap, saturating=False)

    # Windowed expansion: slot k's id matches lane (id - base) iff it lies
    # inside this tile's window; out-of-window ids (counted by
    # window_bases as n_escaped) and below-base impossibilities (base is a
    # clip-down of the min live id) match no lane. Pad ids (N) that land
    # inside a top-edge window scatter into column N >= n_splats, which the
    # caller slices away -- same benign-row contract as the resident path.
    onehot = ((idc_ref[0] - base) == jax.lax.broadcasted_iota(
        jnp.int32, (k_cap, width), 1)).astype(jnp.float32)
    contrib = jax.lax.dot_general(
        gacc, onehot, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    win_ref[0] = jnp.concatenate(
        [contrib, jnp.zeros((N_GRAD_FIELDS - 9, width), jnp.float32)],
        axis=0)


def scatter_windows(windows: jax.Array, bases: jax.Array,
                    n_splats: int) -> jax.Array:
    """Accumulate per-tile (16, W) gradient windows onto (16, n_pad).

    Windows and bases are 128-block aligned, so this is a block-row
    scatter-add of n_tiles * W/128 rows of (16, 128) -- the gather/scatter
    unit pays per row (CLAUDE.md), and this row count is ~K/128 times
    smaller than the dense path's per-(tile, slot) segment scatter."""
    n_tiles, nf, width = windows.shape
    np_ = _n_pad(n_splats)
    wb = width // 128
    rows = windows.reshape(n_tiles, nf, wb, 128).transpose(0, 2, 1, 3)
    rows = rows.reshape(n_tiles * wb, nf, 128)
    block_idx = (bases[:, None] // 128
                 + jnp.arange(wb, dtype=jnp.int32)[None, :]).reshape(-1)
    out = jnp.zeros((np_ // 128, nf, 128), jnp.float32).at[block_idx].add(
        rows)
    return out.transpose(1, 0, 2).reshape(nf, np_)


def l2_render_and_grads_window(
    binning: tl.TileBinning,
    table: jax.Array,
    ref_chw: jax.Array,
    n_splats: int,
    cfg: SplatConfig,
    interpret: bool | None = None,
) -> Tuple[jax.Array, GaussianParams, jax.Array]:
    """Windowed fused L2 train path; same contract as
    render_pallas_resident.l2_render_and_grads_resident plus the trailing
    escaped-pair count (gradient contributions the static window lost;
    0 under a correctly tuned cfg.window_width)."""
    if interpret is None:
        interpret = _should_interpret()
    if cfg.window_width is None:
        raise ValueError("cfg.window_width unset; call tune_window")
    width = cfg.window_width
    k = binning.ids.shape[1]
    gy, gx = cfg.n_tiles_y, cfg.n_tiles_x
    n_tiles = gy * gx
    th, tw = cfg.tile_h, cfg.tile_w
    hp = gy * th
    off = jnp.zeros((1,), jnp.int32)
    ids_s, idc = _remap_ids(binning, n_splats)
    bases, escaped = window_bases(binning, n_splats, width)

    color, windows = pl.pallas_call(
        functools.partial(_l2_window_kernel, cfg=cfg, width=width),
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # band offset
            pl.BlockSpec(memory_space=pltpu.SMEM),   # count (whole)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # bases (whole)
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
            pl.BlockSpec((1, N_GRAD_FIELDS, width),
                         lambda i, j, gx=gx: (i * gx + j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 3, hp, cfg.padded_width), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, N_GRAD_FIELDS, width),
                                 jnp.float32),
        ],
        interpret=interpret,
    )(off, binning.count, bases, table, ids_s, idc, ref_chw)

    grads16 = scatter_windows(windows, bases, n_splats)
    from gs2d_tpu.ops.render_pallas import moments_to_grads
    from gs2d_tpu.ops.render_pallas_resident import _table_fields
    grads = moments_to_grads(_unpack_grads(grads16, n_splats),
                             _table_fields(table, n_splats))
    color = jnp.transpose(color[0], (1, 2, 0))[: cfg.height, : cfg.width]
    return color, grads, escaped


def l2_step_window(params: GaussianParams, ref_chw: jax.Array,
                   cfg: SplatConfig, max_per_tile: int):
    """One window-path L2 evaluation: ids-only binning + windowed kernel.

    Returns (color (H, W, 3), grads, n_dropped) where n_dropped folds in
    the window-escaped pairs -- both mean "a static capacity lost work;
    re-tune" (escapes lose only gradient contributions, never forward
    pixels, but the tripwire response is the same)."""
    binning = tl.bin_splats(params, cfg, max_per_tile, ids_only=True)
    table = resident_table(params, cfg)
    color, grads, escaped = l2_render_and_grads_window(
        binning, table, ref_chw, params.pos.shape[0], cfg)
    return color, grads, binning.n_dropped + escaped
