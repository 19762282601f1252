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

The duplication/sort front end is shared with ops/tiles.py (same conservative
bbox, same segmented int32-key sort); only the run extraction differs.
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
) -> tuple[int, int]:
    """Measure tile counts and pick (M rows, max chunks per tile).

    Returns static sizes with headroom: the flat capacity M (multiple of kc)
    and the per-tile chunk-count cap. Counts drift during fitting; overflow
    trips TileBinning.n_dropped and the caller re-tunes.

    ``n_bands > 1`` sizes for banded binning under tile-axis sharding: each
    band of ``n_tiles_y / n_bands`` tile rows is binned separately per
    device, so the (SPMD-uniform) capacity is the max over bands.
    """
    counts = jax.jit(
        lambda q: tl.bin_splats(q, cfg, 1, counts_only=True))(p)
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


def bin_splats_flat(
    p: GaussianParams,
    cfg: SplatConfig,
    m_cap: int,
    kc: int = 256,
    max_chunks: int | None = None,
    max_tiles_per_splat: int | None = None,
    band_row0=0,
    band_rows: int | None = None,
) -> FlatBinning:
    """Build the flat block-aligned (tile, splat) pair layout.

    ``m_cap`` (static, multiple of kc) caps the total flat rows;
    ``max_chunks`` caps any single tile's run at max_chunks*kc entries.
    Overflow of either cap is counted in n_dropped (never silent). Band
    arguments restrict binning to a band of tile rows, as in bin_splats.
    """
    if m_cap % kc:
        raise ValueError(f"m_cap {m_cap} must be a multiple of kc {kc}")
    n = p.pos.shape[0]
    if band_rows is None:
        band_rows = cfg.n_tiles_y
        band_row0 = 0
    n_tiles = band_rows * cfg.n_tiles_x
    if max_tiles_per_splat is None:
        max_tiles_per_splat = cfg.max_tiles_per_splat
    if max_chunks is None:
        max_chunks = m_cap // kc

    # --- shared duplication + segmented sort front end (see tiles.py) -----
    tx0, tx1, ty0, ty1, offscreen = tl.splat_tile_bbox(p, cfg)
    band_row0 = jnp.asarray(band_row0, jnp.int32)
    offscreen = offscreen | (ty1 < band_row0) \
        | (ty0 > band_row0 + (band_rows - 1))
    ty0 = jnp.clip(ty0 - band_row0, 0, band_rows - 1)
    ty1 = jnp.clip(ty1 - band_row0, 0, band_rows - 1)
    w_t = tx1 - tx0 + 1
    h_t = ty1 - ty0 + 1
    count_full = jnp.where(offscreen, 0, w_t * h_t)
    cnt = jnp.minimum(count_full, max_tiles_per_splat)
    dropped_bbox = jnp.sum(count_full - cnt)

    slot = jnp.arange(max_tiles_per_splat, dtype=jnp.int32)
    local_y = slot[None, :] // jnp.maximum(w_t, 1)[:, None]
    local_x = slot[None, :] % jnp.maximum(w_t, 1)[:, None]
    tile_id = ((ty0[:, None] + local_y) * cfg.n_tiles_x
               + tx0[:, None] + local_x).astype(jnp.int32)
    live = slot[None, :] < cnt[:, None]

    tile_bits = max(int(n_tiles).bit_length(), 1)
    splat_bits = max((n - 1).bit_length(), 1)
    seg_bits = min(splat_bits, 30 - tile_bits)
    if seg_bits <= 0:
        raise ValueError(f"too many tiles for int32 keys: {n_tiles}")
    n_segments = -(-n // (1 << seg_bits))
    nseg = -(-n // n_segments)

    splat_ids = jnp.arange(n, dtype=jnp.int32)[:, None] * jnp.ones_like(slot)[None, :]
    local_bits = max((nseg - 1).bit_length(), 1)
    shift = jnp.int32(1 << local_bits)
    pad_key = jnp.int32(jnp.iinfo(jnp.int32).max)
    key = tile_id * shift + (splat_ids % jnp.int32(nseg))
    key = jnp.where(live, key, pad_key)

    pad_rows_n = n_segments * nseg - n
    if pad_rows_n:
        key = jnp.concatenate(
            [key, jnp.full((pad_rows_n, max_tiles_per_splat), pad_key)],
            axis=0)
    key = key.reshape(n_segments, nseg * max_tiles_per_splat)
    sorted_key = jax.lax.sort(key, dimension=-1)

    mask_live = sorted_key != pad_key
    seg_tile = jnp.where(mask_live, sorted_key >> local_bits,
                         jnp.int32(0x7FFFFFFF))
    seg_local = jnp.where(mask_live, sorted_key & (shift - 1), jnp.int32(-1))

    tiles_iota = jnp.arange(n_tiles, dtype=jnp.int32)
    seg_starts = jax.vmap(
        lambda row: jnp.searchsorted(row, tiles_iota, side="left"))(
            seg_tile).astype(jnp.int32)
    seg_ends = jax.vmap(
        lambda row: jnp.searchsorted(row, tiles_iota, side="right"))(
            seg_tile).astype(jnp.int32)
    seg_counts = seg_ends - seg_starts              # (S, n_tiles)
    count_all = jnp.sum(seg_counts, axis=0)         # (n_tiles,)

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

    # --- stitch segment runs into the flat array (one gather) -------------
    # For each output row j: the within-run rank is r = j - start[tile_of_j],
    # and rank r falls in segment s where base[s] <= r < base[s] +
    # seg_counts[s] (segments concatenate in index order, preserving the
    # compositing order across segments). Per-tile values are broadcast onto
    # the M rows with a scatter of run-boundary deltas + prefix sum -- NOT
    # an M-wide gather from the per-tile tables: the TPU gather unit pays
    # per row, and each avoided M-gather costs more than the whole cumsum.
    def run_broadcast(vals):
        vals = vals.astype(jnp.int32)
        out = jnp.zeros((m_cap,), jnp.int32).at[start[1:]].add(
            vals[1:] - vals[:-1], mode="drop")  # start==m_cap rows drop
        out = out.at[0].add(vals[0])
        return jnp.cumsum(out)

    j = jnp.arange(m_cap, dtype=jnp.int32)
    r = j - run_broadcast(start)
    r_ok = (r >= 0) & (r < run_broadcast(count))

    base = jnp.cumsum(seg_counts, axis=0) - seg_counts  # (S, n_tiles) excl
    ids = jnp.full((m_cap,), jnp.int32(-1))
    for s in range(n_segments):
        rs = r - run_broadcast(base[s])
        in_seg = r_ok & (rs >= 0) & (rs < run_broadcast(seg_counts[s]))
        src = jnp.where(in_seg, run_broadcast(seg_starts[s]) + rs, 0)
        got = seg_local[s][src] + jnp.int32(s * nseg)
        ids = jnp.where(in_seg, got, ids)

    # --- pregather packed params on the flat rows --------------------------
    fields_rows = jnp.transpose(tl.packed_fields(p, cfg.splat_bounds))
    safe = jnp.where(ids >= 0, ids, 0)
    rows = fields_rows[safe]                        # (M, F)
    pad_vals = jnp.zeros((tl.N_FIELDS,), jnp.float32)
    pad_vals = pad_vals.at[jnp.array([tl.FIELD_A, tl.FIELD_D, tl.FIELD_SX,
                                      tl.FIELD_SY, tl.FIELD_COS])].set(1.0)
    pad_vals = pad_vals.at[tl.FIELD_H].set(-1.0)
    rows = jnp.where((ids >= 0)[:, None], rows, pad_vals[None, :])

    return FlatBinning(
        ids=ids, rows=rows, start=start.astype(jnp.int32),
        count=count.astype(jnp.int32),
        n_dropped=(dropped_bbox + dropped_chunks + dropped_cap).astype(
            jnp.int32),
    )
