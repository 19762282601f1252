"""Tile binning invariants and Pallas-path parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs2d_tpu.config import SplatConfig
from gs2d_tpu.ops import render_pallas as rp
from gs2d_tpu.ops import tiles as tl
from gs2d_tpu.ops.render_jax import render_backward, render_forward
from tests.helpers import random_splats, to_params

H, W = 48, 64


def make_case(rng, n, **kw):
    cfg = SplatConfig(width=W, height=H, n_splats=n)
    s = random_splats(rng, n, W, H, **kw)
    return cfg, s, to_params(s)


class TestBinning:
    def test_ids_sorted_and_in_order(self, rng):
        cfg, s, p = make_case(rng, 96)
        b = tl.bin_splats(p, cfg, 96)
        ids = np.asarray(b.ids)
        count = np.asarray(b.count)
        assert int(b.n_dropped) == 0
        for t in range(ids.shape[0]):
            live = ids[t, : count[t]]
            # index order within a tile is strictly increasing (no dups)
            assert (np.diff(live) > 0).all() if len(live) > 1 else True
            assert (ids[t, count[t]:] == -1).all()

    def test_covers_all_contributing_splats(self, rng):
        """Every splat covering a pixel (per the exact reference bounds) must
        appear in that pixel's tile list."""
        cfg, s, p = make_case(rng, 64)
        b = tl.bin_splats(p, cfg, 64)
        ids = np.asarray(b.ids)
        count = np.asarray(b.count)
        # brute force: coverage from the scan renderer internals
        from gs2d_tpu.ops.render_jax import _coverage, _splat_scalars
        scal = _splat_scalars(p)
        for i in range(p.pos.shape[0]):
            si = {k: v[i] for k, v in scal.items()}
            mask = np.asarray(_coverage(si["px"], si["py"], si["a"], si["b"],
                                        si["d"], si["h"], cfg)[0])
            ys, xs = np.nonzero(mask)
            tiles_needed = set(zip(ys // cfg.tile_h, xs // cfg.tile_w))
            for ty, tx in tiles_needed:
                t = ty * cfg.n_tiles_x + tx
                assert i in ids[t, : count[t]], (i, ty, tx)

    def test_capacity_overflow_reported(self, rng):
        cfg, s, p = make_case(rng, 64)
        s.pos[:] = np.float32([W / 2, H / 2])  # all splats on one tile stack
        p = to_params(s)
        b = tl.bin_splats(p, cfg, max_per_tile=8)
        assert int(b.n_dropped) > 0

    def test_offscreen_excluded(self, rng):
        cfg, s, p = make_case(rng, 32)
        s.pos[:, 0] += 10000.0
        b = tl.bin_splats(to_params(s), cfg, 32)
        assert int(b.count.sum()) == 0

    def test_counts_only_matches_full(self, rng):
        """counts_only returns the untruncated per-tile counts."""
        cfg, s, p = make_case(rng, 96)
        full = tl.bin_splats(p, cfg, 96)
        counts = tl.bin_splats(p, cfg, 1, counts_only=True)
        np.testing.assert_array_equal(np.asarray(counts),
                                      np.asarray(full.count))

    def test_tune_tile_capacity(self, rng):
        """Tuned capacity covers the measured max with margin; binning at the
        tuned K drops nothing."""
        cfg, s, p = make_case(rng, 96)
        cfg = SplatConfig(width=W, height=H, n_splats=96)
        tuned = tl.tune_tile_capacity(p, cfg)
        k = tuned.max_splats_per_tile
        counts = tl.bin_splats(p, cfg, 1, counts_only=True)
        assert k >= int(np.asarray(counts).max())
        assert k % 64 == 0 if k <= 256 else k % 256 == 0
        b = tl.bin_splats(p, tuned, k)
        assert int(b.n_dropped) == 0


class TestPallasForward:
    @pytest.mark.parametrize("n", [1, 64, 192])
    def test_matches_scan_renderer(self, rng, n):
        cfg, s, p = make_case(rng, n)
        b = tl.bin_splats(p, cfg, max(n, 8))
        C1, T1 = render_forward(p, cfg)
        C2, T2 = rp.forward_tiled(b, cfg)
        np.testing.assert_allclose(np.asarray(C2), np.asarray(C1), atol=3e-7)
        np.testing.assert_allclose(np.asarray(T2), np.asarray(T1), atol=3e-7)

    def test_saturated(self, rng):
        cfg, s, p = make_case(rng, 64, opacity_range=(0.95, 1.0))
        s.pos[:] = np.float32([W / 2, H / 2]) + np.asarray(
            rng.normal(0, 2.0, (64, 2)), np.float32)
        p = to_params(s)
        b = tl.bin_splats(p, cfg, 64)
        C1, T1 = render_forward(p, cfg)
        C2, T2 = rp.forward_tiled(b, cfg)
        assert (np.asarray(T1) < 1 / 256).any()
        np.testing.assert_allclose(np.asarray(C2), np.asarray(C1), atol=3e-7)


class TestPallasBackward:
    def test_matches_scan_backward(self, rng):
        cfg, s, p = make_case(rng, 96)
        b = tl.bin_splats(p, cfg, 96)
        C, _ = rp.forward_tiled(b, cfg)
        ref = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
        gC = C - ref
        g1 = render_backward(p, C, gC, cfg)
        g2 = rp.backward_tiled(b, C, gC, 96, cfg, p)
        for f in ("pos", "sx", "sy", "rot", "color", "opacity"):
            a, c = np.asarray(getattr(g1, f)), np.asarray(getattr(g2, f))
            atol = 1e-4 * max(1.0, np.abs(a).max())
            np.testing.assert_allclose(c, a, atol=atol, err_msg=f)

    def test_custom_vjp_trains(self, rng):
        """End-to-end: the Pallas render plugs into the train loop."""
        from gs2d_tpu.io.image import synthetic_target
        from gs2d_tpu.train.loop import fit

        cfg = SplatConfig(width=W, height=H, n_splats=64)
        ref = jnp.asarray(synthetic_target(H, W))
        state, hist = fit(ref, cfg, iterations=30, render_fn=rp.render,
                          log_every=10, log_fn=None)
        assert hist[-1]["mse"] < hist[0]["mse"] * 0.8


class TestSegmentedSortFallback:
    def test_matches_single_segment_path(self, rng):
        """The segmented sort (used when packed keys would overflow int32 at
        huge N) must bin identically to the single-segment path."""
        cfg, s, p = make_case(rng, 96)
        a = tl.bin_splats(p, cfg, 96)
        b = tl.bin_splats(p, cfg, 96, _force_segmented=True)
        np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
        np.testing.assert_array_equal(np.asarray(a.count), np.asarray(b.count))
        np.testing.assert_array_equal(
            np.asarray(a.tile_params), np.asarray(b.tile_params))


class TestBinningPolicy:
    """resolve_binning: the measured auto policy (BASELINE.md crossover)."""

    def test_auto_policy(self):
        from gs2d_tpu.config import SplatConfig
        from gs2d_tpu.ops.render_pallas_flat import resolve_binning

        mk = lambda n, **kw: SplatConfig(width=535, height=426, n_splats=n,
                                         tile_h=32, **kw)
        assert resolve_binning(mk(1024)) == "resident"
        assert resolve_binning(mk(4096)) == "resident"
        assert resolve_binning(mk(8192)) == "flat"
        assert resolve_binning(mk(1024, binning="dense")) == "dense"
        assert resolve_binning(mk(1024, binning="flat")) == "flat"
        # Big image: the ids matrix overflows the SMEM budget -> not resident.
        big = SplatConfig(width=3840, height=2160, n_splats=4096, tile_h=32)
        assert resolve_binning(big) != "resident"

    def test_unknown_binning_raises(self):
        import pytest

        from gs2d_tpu.config import SplatConfig
        from gs2d_tpu.ops.render_pallas_flat import resolve_binning

        with pytest.raises(ValueError):
            resolve_binning(SplatConfig(binning="bogus"))


class TestTileHeightPolicy:
    """Depth-aware tile-height policy (measured, BASELINE.md)."""

    def test_depth_aware(self):
        from gs2d_tpu.config import SplatConfig
        from gs2d_tpu.ops.tiles import (DEEPER_TILE_H, PRODUCTION_TILE_H,
                                        tune_tile_height)
        from gs2d_tpu.params import init_params

        deep = SplatConfig(width=1920, height=1080, n_splats=1048576)
        assert tune_tile_height(
            deep, init_params(deep)).tile_h == DEEPER_TILE_H
        shallow = SplatConfig(width=268, height=213, n_splats=1024)
        assert tune_tile_height(
            shallow, init_params(shallow)).tile_h == PRODUCTION_TILE_H
        assert tune_tile_height(deep).tile_h == PRODUCTION_TILE_H

    def test_span_gate(self):
        """Pixel-scale populations (mean vertical span ~1 tile) never
        escalate, no matter how deep: taller tiles cannot shrink M there
        (measured LOSS 1.33x at 1080p/1M px-init, see tune_tile_height)."""
        from gs2d_tpu.config import SplatConfig
        from gs2d_tpu.ops.tiles import PRODUCTION_TILE_H, tune_tile_height
        from gs2d_tpu.params import init_params

        px = SplatConfig(width=1920, height=1080, n_splats=1048576,
                         init_scale_min=1.0, init_scale_max=2.0)
        assert tune_tile_height(px, init_params(px)).tile_h \
            == PRODUCTION_TILE_H


class TestTuneRebinMargin:
    """--rebin-margin -1 (auto): slack from measured pair inflation."""

    def test_sparse_keeps_full_margin(self, rng):
        # Big footprints spanning several tiles: 2px of slack barely moves
        # the binned-pair count.
        cfg, s, p = make_case(rng, 16)
        s.sx[:] = 12.0
        s.sy[:] = 12.0
        out = tl.tune_rebin_margin(
            to_params(s), cfg.replace(rebin_margin=-1.0))
        assert out.rebin_margin == 2.0

    def test_tiny_footprints_back_off(self, rng):
        # Tiny splats on small tiles: every pixel of slack spills most
        # footprints into neighbour tiles, inflating pairs far past 30%.
        n = 64
        cfg = SplatConfig(width=W, height=H, n_splats=n, tile_h=8)
        s = random_splats(rng, n, W, H)
        s.sx[:] = 0.8
        s.sy[:] = 0.8
        out = tl.tune_rebin_margin(
            to_params(s), cfg.replace(rebin_margin=-1.0))
        assert out.rebin_margin < 2.0

    def test_monotone_superset(self, rng):
        # The tuned margin always bins a superset of the exact pairs.
        cfg, s, p = make_case(rng, 32)
        out = tl.tune_rebin_margin(p, cfg.replace(rebin_margin=-1.0))
        exact = int(tl.bin_splats(p, cfg, 1, counts_only=True).sum())
        marg = int(tl.bin_splats(p, cfg, 1, counts_only=True,
                                 margin=out.rebin_margin).sum())
        assert marg >= exact
