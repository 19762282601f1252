"""Flat segmented tile binning for large splat populations.

The dense binning (ops/tiles.py) pads every tile's list to the static
capacity K, so the parameter pregather, the kernel DMA, and the gradient
scatter all cost O(n_tiles * K) rows even when the mean tile count is far
below the max (measured 5-7x waste at mid scale, worse at 1M where the
gather/scatter units dominate the step, see BASELINE.md).

This module replaces the padded (n_tiles, K) matrix with a single flat
array of (tile, splat) pairs sorted by (tile id, splat index):

    ids   (M,)    flat splat ids; tile t owns rows [start[t], start[t]+count[t])
    rows  (M, F)  pregathered per-splat scalars (ops/tiles.py packed_fields)
    start (n_tiles,) block-aligned run starts (multiples of the kernel chunk)

Each tile's run start is aligned up to the kernel chunk size kc, so a tile's
chunks are whole blocks of the flat array and no block is shared by two
tiles: the Pallas kernels walk blocks ``start[t]//kc + c`` via scalar
prefetch (pltpu.PrefetchScalarGridSpec), the gradient kernel writes per-pair
gradient rows back to the same flat blocks, and one scatter-add of M rows
(instead of n_tiles*K) segments them onto the splat axis.

Cost: O(total pairs + n_tiles*kc/2) rows end to end -- proportional to the
work that actually exists. Order contract: runs are in ascending splat index
(compositing order, Form.pdf p2), exactly like the dense binner.

Construction is an exact-count expansion (each splat owns exactly w*h rows,
no per-splat slot cap, so coverage is never bbox-truncated) followed by ONE
stable sort keyed on the tile id alone: expansion rows are already in splat
order, so stability gives the (tile, splat) lexicographic order without
packing composite sort keys (which overflowed int32 at 4K tile counts and
forced the old segmented multi-sort + per-segment stitch gathers).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gs2d_tpu.config import SplatConfig
from gs2d_tpu.ops import tiles as tl
from gs2d_tpu.params import GaussianParams


class FlatBinning(NamedTuple):
    """Flat (tile, splat) pair layout; see module docstring."""

    ids: jax.Array     # (M,) int32, -1 on padding rows
    rows: jax.Array    # (M, N_FIELDS) f32 pregathered params, benign padding
    start: jax.Array   # (n_tiles,) int32, multiples of kc
    count: jax.Array   # (n_tiles,) int32 live entries per tile
    n_dropped: jax.Array  # scalar int32: pairs lost to capacity caps


def flat_capacity(counts, kc: int) -> int:
    """Rows needed for the block-aligned flat layout of measured counts."""
    import numpy as np

    c = np.asarray(counts)
    return int((-(-c // kc) * kc).sum())


def tune_flat_capacity(
    p: GaussianParams,
    cfg: SplatConfig,
    kc: int = 256,
    margin: float = 1.5,
    n_bands: int = 1,
    bin_margin: float = 0.0,
) -> tuple[int, int]:
    """Measure tile counts and pick (M rows, max chunks per tile).

    Returns static sizes with headroom: the flat capacity M (multiple of kc)
    and the per-tile chunk-count cap. Counts drift during fitting; overflow
    trips TileBinning.n_dropped and the caller re-tunes.

    ``n_bands > 1`` sizes for banded binning under tile-axis sharding: each
    band of ``n_tiles_y / n_bands`` tile rows is binned separately per
    device, so the (SPMD-uniform) capacity is the max over bands.

    ``bin_margin`` measures with that many pixels of footprint slack --
    lazy-rebinning callers (cfg.rebin_margin > 0) bin a margined superset,
    which must be sized AS the superset: capacity tuned from margin-0
    counts can overflow on the very first margined bin, making the lazy
    cache permanently invalid (n_dropped > 0 forces a rebin every step
    while still dropping pairs).
    """
    counts = jax.jit(
        lambda q: tl.bin_splats(q, cfg, 1, counts_only=True,
                                margin=bin_margin))(p)
    counts = jax.device_get(counts)
    if n_bands > 1:
        if cfg.n_tiles_y % n_bands:
            raise ValueError(
                f"{cfg.n_tiles_y} tile rows not divisible by {n_bands} bands")
        per_band = counts.reshape(n_bands, -1)
        need = max(flat_capacity(b, kc) for b in per_band)
    else:
        need = flat_capacity(counts, kc)
    m = max(kc, int(need * margin))
    m = -(-m // kc) * kc
    max_chunks = max(1, -(-int(counts.max() * margin) // kc))
    return m, max_chunks


def pregather_rows(ids: jax.Array, p: GaussianParams,
                   cfg: SplatConfig) -> jax.Array:
    """Pregather packed per-splat params onto the flat rows.

    O(M) rows through the gather unit -- the only param-dependent part of
    the flat layout, so the lazy-rebinning cache re-runs just this per
    step while the expansion + sort structure (ids/start/count) is
    reused. Padding rows (id -1) get numerically benign values (the same
    pad_vals contract as ops/tiles.py)."""
    fields_rows = jnp.transpose(tl.packed_fields(p, cfg.splat_bounds))
    safe = jnp.where(ids >= 0, ids, 0)
    rows = fields_rows[safe]                        # (M, F)
    pad_vals = jnp.zeros((tl.N_FIELDS,), jnp.float32)
    pad_vals = pad_vals.at[jnp.array([tl.FIELD_A, tl.FIELD_D, tl.FIELD_SX,
                                      tl.FIELD_SY, tl.FIELD_COS])].set(1.0)
    pad_vals = pad_vals.at[tl.FIELD_H].set(-1.0)
    return jnp.where((ids >= 0)[:, None], rows, pad_vals[None, :])


def bin_splats_flat(
    p: GaussianParams,
    cfg: SplatConfig,
    m_cap: int,
    kc: int = 256,
    max_chunks: int | None = None,
    max_tiles_per_splat: int | None = None,
    band_row0=0,
    band_rows: int | None = None,
    ids_only: bool = False,
    margin: float = 0.0,
) -> FlatBinning:
    """Build the flat block-aligned (tile, splat) pair layout.

    ``m_cap`` (static, multiple of kc) caps the total flat rows;
    ``max_chunks`` caps any single tile's run at max_chunks*kc entries.
    Overflow of either cap is counted in n_dropped (never silent). Band
    arguments restrict binning to a band of tile rows, as in bin_splats.

    ``ids_only`` skips the per-row parameter pregather (rows comes back
    as a (1, N_FIELDS) placeholder) -- for the lazy-rebinning cache,
    which re-pregathers from the live params every step
    (``pregather_rows``). ``margin`` (pixels) expands every footprint
    (bbox AND cull test) by that slack, making the pair set a superset
    that stays valid while splats drift less than the margin -- the same
    contract as ``tiles.bin_splats(margin=...)``, checked by
    ``tiles.pairs_covered_by``.
    """
    if m_cap % kc:
        raise ValueError(f"m_cap {m_cap} must be a multiple of kc {kc}")
    n = p.pos.shape[0]
    if band_rows is None:
        band_rows = cfg.n_tiles_y
        band_row0 = 0
    n_tiles = band_rows * cfg.n_tiles_x
    if max_chunks is None:
        max_chunks = m_cap // kc
    del max_tiles_per_splat  # exact expansion: no per-splat tile cap at all

    # --- exact-count pair expansion ---------------------------------------
    # Each splat owns a run of exactly w*h rows in the expansion array (no
    # per-splat slot cap, so large splats are never bbox-truncated). The
    # row -> owning-splat map is built with ONE scatter+cumsum (+1 at every
    # run start; coincident starts of empty splats telescope so empty runs
    # are skipped); every other per-splat value then arrives through ONE
    # multi-channel row gather. Measured on v5e (2026-08-19, N=1M, E=2M):
    # a scatter+cumsum broadcast costs ~10 ms PER CHANNEL while a whole
    # (E, 12) row gather is ~16 ms -- the gather unit pays per row, not
    # per element, so above one channel the gather wins (the original
    # per-channel-broadcast design predates the cull's 5-6 float channels).
    (tx0, tx1, ty0, ty1, offscreen), (qpx, qpy, qa, qb, qd, qk2) = \
        tl._bbox_and_quad(p, cfg, margin)
    band_row0 = jnp.asarray(band_row0, jnp.int32)
    offscreen = offscreen | (ty1 < band_row0) \
        | (ty0 > band_row0 + (band_rows - 1))
    ty0 = jnp.clip(ty0 - band_row0, 0, band_rows - 1)
    ty1 = jnp.clip(ty1 - band_row0, 0, band_rows - 1)
    w_t = tx1 - tx0 + 1
    h_t = ty1 - ty0 + 1
    cnt = jnp.where(offscreen, 0, w_t * h_t)
    starts = jnp.cumsum(cnt) - cnt                  # exclusive, (n,)
    total = starts[-1] + cnt[-1]
    e_cap = m_cap                                   # expansion capacity
    dropped_exp = jnp.maximum(total - e_cap, 0)

    e = jnp.arange(e_cap, dtype=jnp.int32)
    live_e = e < total
    owner_inc = jnp.zeros((e_cap,), jnp.int32).at[starts[1:]].add(
        1, mode="drop")                             # starts >= e_cap drop
    owner = jnp.cumsum(owner_inc)                   # (E,) splat per row

    chans = [starts, w_t, ty0, tx0]
    if cfg.exact_cull:
        bc = lambda v: jax.lax.bitcast_convert_type(
            v.astype(jnp.float32), jnp.int32)
        chans += [bc(qpx), bc(qpy), bc(qa), bc(qb), bc(qd)]
        if qk2 is not None:
            chans.append(bc(qk2))
    ch = jnp.stack(chans, axis=1)[owner]            # ONE (E, C) row gather

    rank = e - ch[:, 0]
    wb = jnp.maximum(ch[:, 1], 1)
    ly = rank // wb
    lx = rank - ly * wb
    ty_e = ch[:, 2] + ly
    tx_e = ch[:, 3] + lx
    tile_e = ty_e * cfg.n_tiles_x + tx_e
    if cfg.exact_cull:
        # Exact-ellipse tile culling (tiles.tile_may_touch) on the exact
        # f32 bit patterns fetched by the row gather.
        fc = lambda i: jax.lax.bitcast_convert_type(ch[:, i], jnp.float32)
        live_e = live_e & tl.tile_may_touch(
            fc(4), fc(5), fc(6), fc(7), fc(8),
            tx_e, band_row0 + ty_e, cfg, margin,
            k2=fc(9) if qk2 is not None else None)
    tile_e = jnp.where(live_e, tile_e, jnp.int32(n_tiles))  # dead rows last
    splat_e = jnp.where(live_e, owner, -1)

    # --- one stable sort by tile id ---------------------------------------
    # Expansion rows are in ascending splat order, so a stable sort on the
    # (small-int) tile key alone yields (tile, splat)-lexicographic order:
    # exactly the compositing order the kernels need (Form.pdf p2).
    sorted_tile, sorted_id = jax.lax.sort(
        (tile_e, splat_e), num_keys=1, is_stable=True)

    tiles_iota = jnp.arange(n_tiles, dtype=jnp.int32)
    run_start = jnp.searchsorted(sorted_tile, tiles_iota,
                                 side="left").astype(jnp.int32)
    run_end = jnp.searchsorted(sorted_tile, tiles_iota,
                               side="right").astype(jnp.int32)
    count_all = run_end - run_start                 # (n_tiles,)

    # --- block-aligned flat run layout -------------------------------------
    count = jnp.minimum(count_all, max_chunks * kc)
    dropped_chunks = jnp.sum(count_all - count)
    blocks = -(-count // kc)                        # chunks per tile
    start_raw = (jnp.cumsum(blocks) - blocks) * kc  # aligned starts
    # Tiles whose run would spill past the flat capacity are dropped whole
    # (counted); their start is clamped to m_cap, which keeps the array
    # non-decreasing (searchsorted requirement) and maps them to zero rows.
    fits = start_raw + blocks * kc <= m_cap
    dropped_cap = jnp.sum(jnp.where(fits, 0, count))
    count = jnp.where(fits, count, 0)
    start = jnp.minimum(start_raw, m_cap)

    # --- scatter sorted rows to their block-aligned flat positions --------
    # Sorted row p of tile t lands at start[t] + (p - run_start[t]). The
    # per-tile values arrive through one (E, 3) row gather keyed on
    # sorted_tile (the sorted keys ARE the owning tile ids -- no broadcast
    # needed at all; dead rows carry key n_tiles, clamped then masked).
    tch = jnp.stack([run_start, count, start], axis=1)[
        jnp.minimum(sorted_tile, n_tiles - 1)]
    p_iota = jnp.arange(e_cap, dtype=jnp.int32)
    rank_t = p_iota - tch[:, 0]
    valid = (sorted_tile < n_tiles) & (rank_t < tch[:, 1])
    dest = jnp.where(valid, tch[:, 2] + rank_t, m_cap)
    ids = jnp.full((m_cap,), jnp.int32(-1)).at[dest].set(
        sorted_id, mode="drop")
    dropped_bbox = jnp.int32(0)  # exact expansion: bbox never truncated

    rows = (jnp.zeros((1, tl.N_FIELDS), jnp.float32) if ids_only
            else pregather_rows(ids, p, cfg))

    return FlatBinning(
        ids=ids, rows=rows, start=start.astype(jnp.int32),
        count=count.astype(jnp.int32),
        n_dropped=(dropped_bbox + dropped_exp + dropped_chunks
                   + dropped_cap).astype(jnp.int32),
    )
