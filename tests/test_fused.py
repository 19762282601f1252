"""Fused L2 train path (single and chunked) vs the reference scan path,
in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs2d_tpu.config import SplatConfig
from gs2d_tpu.io.image import synthetic_target
from gs2d_tpu.ops import render_pallas as rp
from gs2d_tpu.ops import tiles as tl
from gs2d_tpu.ops.render_jax import render_backward, render_forward
from gs2d_tpu.train.loop import init_train_state, make_train_step, \
    make_train_step_fused
from tests.helpers import random_splats, to_params

H, W = 48, 64


def case(rng, n, **kw):
    cfg = SplatConfig(width=W, height=H, n_splats=n, **kw)
    s = random_splats(rng, n, W, H)
    ref = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    return cfg, to_params(s), ref


class TestFusedKernel:
    @pytest.mark.parametrize("chunk", [None, 64])
    def test_matches_scan_path(self, rng, chunk):
        cfg, p, ref = case(rng, 128)
        b = tl.bin_splats(p, cfg, 128)
        refc = rp.pad_ref_chw(jnp.asarray(ref), cfg)
        if chunk is None:
            C, g = rp.l2_render_and_grads(b, refc, 128, cfg, p)
        else:
            C, g = rp.l2_render_and_grads_chunked(b, refc, 128, cfg, p,
                                                  chunk=chunk)
        C1, _ = render_forward(p, cfg)
        g1 = render_backward(p, C1, C1 - jnp.asarray(ref), cfg)
        np.testing.assert_allclose(np.asarray(C), np.asarray(C1), atol=3e-7)
        for f in ("pos", "sx", "sy", "rot", "color", "opacity"):
            a, c = np.asarray(getattr(g1, f)), np.asarray(getattr(g, f))
            atol = 1e-4 * max(1.0, np.abs(a).max())
            np.testing.assert_allclose(c, a, atol=atol, err_msg=f)

    def test_train_step_fused_matches_modular(self, rng):
        """One optimizer step via the fused kernel == via the custom-VJP
        scan path (same Adam, same cotangent)."""
        cfg = SplatConfig(width=W, height=H, n_splats=64,
                          max_splats_per_tile=64)
        ref = synthetic_target(H, W)
        state = init_train_state(cfg)

        fused = make_train_step_fused(cfg)
        refc = rp.pad_ref_chw(jnp.asarray(ref), cfg)
        s_f, aux_f = fused(state, refc)

        modular = make_train_step(cfg)
        s_m, aux_m = modular(state, jnp.asarray(ref))

        assert np.isclose(float(aux_f.mse), float(aux_m.mse), rtol=1e-5)
        for f in ("pos", "sx", "sy", "rot", "color", "opacity"):
            a = np.asarray(getattr(s_m.params, f))
            c = np.asarray(getattr(s_f.params, f))
            np.testing.assert_allclose(c, a, rtol=1e-4, atol=2e-3, err_msg=f)

    def test_fit_scan_fused_matches_step_loop(self, rng):
        """K iterations via the on-device lax.scan == K single-step calls
        (bitwise: same traced computation, same order)."""
        from gs2d_tpu.train.loop import make_fit_scan_fused

        cfg = SplatConfig(width=W, height=H, n_splats=64,
                          max_splats_per_tile=64)
        ref = synthetic_target(H, W)
        refc = rp.pad_ref_chw(jnp.asarray(ref), cfg)
        step = make_train_step_fused(cfg)
        s_loop = init_train_state(cfg)
        mses = []
        for _ in range(5):
            s_loop, aux = step(s_loop, refc)
            mses.append(float(aux.mse))

        fit_k = make_fit_scan_fused(cfg)
        s_scan, auxes = fit_k(init_train_state(cfg), refc, 5)
        np.testing.assert_allclose(np.asarray(auxes.mse), mses, rtol=1e-6)
        for f in ("pos", "sx", "sy", "rot", "color", "opacity"):
            np.testing.assert_allclose(
                np.asarray(getattr(s_scan.params, f)),
                np.asarray(getattr(s_loop.params, f)),
                rtol=1e-5, atol=1e-5, err_msg=f)

    def test_fit_scan_chunk_driver(self, rng):
        """fit(scan_chunk=K) produces the same history records as fit()."""
        from gs2d_tpu.train.loop import fit

        cfg = SplatConfig(width=W, height=H, n_splats=64,
                          max_splats_per_tile=64)
        ref = jnp.asarray(synthetic_target(H, W))
        _, h_plain = fit(ref, cfg, iterations=6, log_every=2, log_fn=None,
                         use_fused=True)
        _, h_scan = fit(ref, cfg, iterations=6, log_every=2, log_fn=None,
                        use_fused=True, scan_chunk=4)
        assert [r["iter"] for r in h_scan] == [r["iter"] for r in h_plain]
        for a, b in zip(h_scan, h_plain):
            assert np.isclose(a["mse"], b["mse"], rtol=1e-5)

    def test_fused_convergence(self, rng):
        cfg = SplatConfig(width=W, height=H, n_splats=64,
                          max_splats_per_tile=64)
        ref = synthetic_target(H, W)
        refc = rp.pad_ref_chw(jnp.asarray(ref), cfg)
        step = make_train_step_fused(cfg)
        state = init_train_state(cfg)
        first = None
        for i in range(25):
            state, aux = step(state, refc)
            if first is None:
                first = float(aux.mse)
        assert float(aux.mse) < first * 0.7


class TestGCache:
    @pytest.mark.parametrize("binning", ["dense", "resident"])
    def test_cached_backward_matches(self, rng, binning):
        """The G-cache replay (alpha_cache=True) computes the SAME math as
        the re-deriving backward: alpha = G * op is exactly how the
        forward built alpha, and masked pairs (G == 0) contribute exact
        zeros to every gradient term. A pure-jnp step-by-step replica of
        both backward loops is bitwise identical (verified while building
        this); through two different compiled kernel programs XLA's
        excess-precision fusion drifts ~1 ulp (the same documented
        phenomenon as the across-tile_h forward drift), so the
        whole-kernel assert uses that standard. The forward color is
        bitwise (same program structure)."""
        cfg, p, ref = case(rng, 96)
        cfg = cfg.replace(tile_h=32, binning=binning)
        refc = rp.pad_ref_chw(jnp.asarray(ref), cfg)

        def run(alpha_cache):
            c = cfg.replace(alpha_cache=alpha_cache)
            if binning == "resident":
                from gs2d_tpu.ops import render_pallas_resident as rpr

                return rpr.l2_step_resident(p, refc, c, 96)[:2]
            b = tl.bin_splats(p, c, 96)
            return rp.l2_render_and_grads(b, refc, 96, c, p)

        (C_c, g_c), (C_u, g_u) = run(True), run(False)
        np.testing.assert_array_equal(np.asarray(C_c), np.asarray(C_u))
        for f in ("pos", "sx", "sy", "rot", "color", "opacity"):
            a = np.asarray(getattr(g_u, f))
            atol = 1e-5 * max(1.0, np.abs(a).max())
            np.testing.assert_allclose(
                np.asarray(getattr(g_c, f)), a, atol=atol, err_msg=f)


class TestBatchedFused:
    def test_batch_matches_per_image(self, rng):
        from gs2d_tpu.parallel.sharded import init_batched_state
        from gs2d_tpu.train.loop import make_batched_train_step_fused

        cfg = SplatConfig(width=W, height=H, n_splats=32,
                          max_splats_per_tile=32)
        refs = np.stack([synthetic_target(H, W, seed=s) for s in (0, 2)])
        refs_chw = jnp.stack([rp.pad_ref_chw(jnp.asarray(r), cfg)
                              for r in refs])
        state = init_batched_state(cfg, 2)
        bstep = make_batched_train_step_fused(cfg)
        bstate, baux = bstep(state, refs_chw)

        sstep = make_train_step_fused(cfg)
        for i in range(2):
            s_i = jax.tree.map(lambda x: x[i], state)
            out_i, aux_i = sstep(s_i, refs_chw[i])
            assert np.isclose(float(baux.mse[i]), float(aux_i.mse), rtol=1e-6)
            for f in ("pos", "color"):
                np.testing.assert_allclose(
                    np.asarray(getattr(bstate.params, f))[i],
                    np.asarray(getattr(out_i.params, f)), atol=1e-6)


class TestBatchedScanFitter:
    def test_scan_matches_stepped(self, rng):
        """The batched scan fitter == iterating the batched step."""
        from gs2d_tpu.parallel.sharded import init_batched_state
        from gs2d_tpu.train.loop import (make_batched_train_step_fused,
                                         make_fit_scan_batched)

        cfg = SplatConfig(width=W, height=H, n_splats=32,
                          max_splats_per_tile=32)
        refs = np.stack([synthetic_target(H, W, seed=s) for s in (0, 2)])
        refs_chw = jnp.stack([rp.pad_ref_chw(jnp.asarray(r), cfg)
                              for r in refs])
        state = init_batched_state(cfg, 2)

        s_scan, auxes = make_fit_scan_batched(cfg)(state, refs_chw, 5)
        bstep = make_batched_train_step_fused(cfg)
        s_it = state
        for _ in range(5):
            s_it, aux = bstep(s_it, refs_chw)
        np.testing.assert_allclose(np.asarray(auxes.mse[-1]),
                                   np.asarray(aux.mse), rtol=1e-6)
        for f in ("pos", "color", "opacity"):
            np.testing.assert_allclose(
                np.asarray(getattr(s_scan.params, f)),
                np.asarray(getattr(s_it.params, f)), atol=1e-6, err_msg=f)


class TestMxuVariant:
    def test_matches_scan_path_interpret(self, rng):
        """Experimental MXU formulation: allclose (not bitwise -- d2 comes
        from a coefficient matmul) to the reference scan path."""
        from gs2d_tpu.ops.render_pallas_mxu import l2_render_and_grads_mxu

        cfg, p, ref = case(rng, 128)
        b = tl.bin_splats(p, cfg, 128)
        refc = rp.pad_ref_chw(jnp.asarray(ref), cfg)
        C, g = l2_render_and_grads_mxu(b, refc, 128, cfg, chunk=64)
        C1, _ = render_forward(p, cfg)
        g1 = render_backward(p, C1, C1 - jnp.asarray(ref), cfg)
        np.testing.assert_allclose(np.asarray(C), np.asarray(C1), atol=5e-5)
        for f in ("pos", "sx", "sy", "rot", "color", "opacity"):
            a, c = np.asarray(getattr(g1, f)), np.asarray(getattr(g, f))
            atol = 2e-3 * max(1.0, np.abs(a).max())
            np.testing.assert_allclose(c, a, atol=atol, err_msg=f)


class TestChunkedModular:
    def test_forward_backward_chunked_matches_scan(self, rng):
        """K > 256 routes the modular forward/backward through the chunked
        kernels (SMEM O(chunk) for any per-tile list length); results must
        match the scan reference exactly like the unchunked path."""
        n = 512
        cfg = SplatConfig(width=W, height=H, n_splats=n)
        s = random_splats(rng, n, W, H)
        p = to_params(s)
        ref = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)

        b = tl.bin_splats(p, cfg, 512)          # k=512 -> chunked dispatch
        C, T = rp.forward_tiled(b, cfg)
        C1, T1 = render_forward(p, cfg)
        np.testing.assert_allclose(np.asarray(C), np.asarray(C1), atol=3e-7)
        np.testing.assert_allclose(np.asarray(T), np.asarray(T1), atol=3e-7)

        g = rp.backward_tiled(b, C, C - jnp.asarray(ref), n, cfg, p)
        g1 = render_backward(p, C1, C1 - jnp.asarray(ref), cfg)
        for f in ("pos", "sx", "sy", "rot", "color", "opacity"):
            a, c = np.asarray(getattr(g1, f)), np.asarray(getattr(g, f))
            atol = 1e-4 * max(1.0, np.abs(a).max())
            np.testing.assert_allclose(c, a, atol=atol, err_msg=f)

    def test_chunked_saturation(self, rng):
        """Opaque overlapping splats saturate T mid-list; skipped chunks must
        contribute exact zeros (fresh grads blocks) and the composite must
        still match the scan path."""
        n = 512
        cfg = SplatConfig(width=W, height=H, n_splats=n)
        s = random_splats(rng, n, W, H, opacity_range=(0.9, 1.0))
        s.pos[:] = np.float32([W / 2, H / 2]) \
            + rng.normal(0, 3.0, (n, 2)).astype(np.float32)
        p = to_params(s)
        ref = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)

        b = tl.bin_splats(p, cfg, 512)
        C, T = rp.forward_tiled(b, cfg)
        C1, T1 = render_forward(p, cfg)
        assert (np.asarray(T1) < 1.0 / 256.0).any()
        np.testing.assert_allclose(np.asarray(C), np.asarray(C1), atol=3e-7)

        g = rp.backward_tiled(b, C, C - jnp.asarray(ref), n, cfg, p)
        g1 = render_backward(p, C1, C1 - jnp.asarray(ref), cfg)
        for f in ("pos", "color", "opacity"):
            a, c = np.asarray(getattr(g1, f)), np.asarray(getattr(g, f))
            atol = 2e-4 * max(1.0, np.abs(a).max())
            np.testing.assert_allclose(c, a, atol=atol, err_msg=f)


class TestTileHeight:
    """Production tile-height policy: 32-row tiles (measured sweep,
    BASELINE.md) must be a pure layout change -- forward equal to ~1 ulp
    (Mosaic emits different mul/add fusion shapes per block geometry),
    grads equal up to partition reassociation."""

    def test_tile_h_equivalence(self, rng):
        cfg0, p, ref = case(rng, 64, max_splats_per_tile=64)
        outs = {}
        for th in (8, 16, 32):
            cfg = cfg0.replace(tile_h=th)
            b = tl.bin_splats(p, cfg, 64)
            refc = rp.pad_ref_chw(jnp.asarray(ref), cfg)
            color, grads = rp.l2_render_and_grads(b, refc, 64, cfg, p)
            outs[th] = (np.asarray(color)[:H, :W],
                        jax.tree.map(np.asarray, grads))
        for th in (16, 32):
            np.testing.assert_allclose(outs[8][0], outs[th][0],
                                       rtol=3e-7, atol=2e-7)
            for f in ("pos", "sx", "sy", "rot", "color", "opacity"):
                np.testing.assert_allclose(
                    getattr(outs[8][1], f), getattr(outs[th][1], f),
                    rtol=1e-3, atol=2e-6, err_msg=f"{f} th={th}")

    def test_tune_tile_height(self):
        cfg = SplatConfig(width=W, height=H, n_splats=8)
        assert tl.tune_tile_height(cfg).tile_h == tl.PRODUCTION_TILE_H
        big = SplatConfig(width=3840, height=2160, n_splats=8)
        assert tl.tune_tile_height(big).tile_h == tl.PRODUCTION_TILE_H


class TestDeadSlotGrads:
    """moments_to_grads must emit exactly-zero (not NaN) opacity gradients
    for dead slots (opacity == 0, as densify/prune parks them).

    Regression (ADVICE round 4, medium): the moment-form refactor computed
    the opacity gradient as M0/op, which is 0/0 = NaN on dead slots where
    the reference form (main.cpp:703, dalpha/do = G) gives exact 0. The
    NaN was masked by freeze_dead_slots in the trainer but contaminated
    any direct consumer of the returned grads."""

    def test_zero_opacity_grads_are_zero(self, rng):
        from gs2d_tpu.train.densify import DEAD_POS
        cfg, p, ref = case(rng, 64, max_splats_per_tile=64)
        # park slots 0..4 the way densify_and_prune does
        p = jax.tree.map(jnp.asarray, p)
        p = p.replace(
            pos=p.pos.at[:5].set(DEAD_POS),
            opacity=p.opacity.at[:5].set(0.0))
        b = tl.bin_splats(p, cfg, 64)
        refc = rp.pad_ref_chw(jnp.asarray(ref), cfg)
        _, g = rp.l2_render_and_grads(b, refc, 64, cfg, p)
        for f in ("pos", "sx", "sy", "rot", "color", "opacity"):
            arr = np.asarray(getattr(g, f))
            assert np.isfinite(arr).all(), f"{f} grads not finite"
        assert (np.asarray(g.opacity)[:5] == 0.0).all()


class TestBatchedFlatLayout:
    """Batched multi-image fitting on the FLAT layout (north-star configs[4]
    needs flat at 4K-scale populations; round-4 VERDICT missing item 4)."""

    def test_flat_batched_matches_single(self, rng):
        from gs2d_tpu.ops import render_pallas_flat as rpf
        from gs2d_tpu.parallel.sharded import init_batched_state
        from gs2d_tpu.train.loop import (make_batched_train_step_fused,
                                         make_train_step_fused)

        cfg = SplatConfig(width=W, height=H, n_splats=96, binning="flat",
                          flat_chunk=32)
        from gs2d_tpu.params import init_params
        cfg = rpf.tune_flat_config(init_params(cfg), cfg)
        refs = np.stack([synthetic_target(H, W, seed=s) for s in (0, 2)])
        refs_chw = jnp.stack([rp.pad_ref_chw(jnp.asarray(r), cfg)
                              for r in refs])
        state = init_batched_state(cfg, 2)
        bstate, baux = make_batched_train_step_fused(cfg)(state, refs_chw)
        sstep = make_train_step_fused(cfg)
        for i in range(2):
            s_i = jax.tree.map(lambda x: x[i], state)
            out_i, aux_i = sstep(s_i, refs_chw[i])
            assert np.isclose(float(baux.mse[i]), float(aux_i.mse),
                              rtol=1e-6)
            for f in ("pos", "color"):
                np.testing.assert_allclose(
                    np.asarray(getattr(bstate.params, f))[i],
                    np.asarray(getattr(out_i.params, f)), atol=1e-6)

    def test_flat_batched_scan_with_lazy_rebinning(self, rng):
        """Scanned batched fitter carries per-image flat caches; margin=2
        trajectory matches eager margin=0 within the documented drift."""
        from gs2d_tpu.ops import render_pallas_flat as rpf
        from gs2d_tpu.params import init_params
        from gs2d_tpu.parallel.sharded import init_batched_state
        from gs2d_tpu.train.loop import make_fit_scan_batched

        cfg0 = SplatConfig(width=W, height=H, n_splats=96, binning="flat",
                           flat_chunk=32)
        cfg0 = rpf.tune_flat_config(init_params(cfg0), cfg0)
        refs = np.stack([synthetic_target(H, W, seed=s) for s in (0, 2)])
        refs_chw = jnp.stack([rp.pad_ref_chw(jnp.asarray(r), cfg0)
                              for r in refs])
        state = init_batched_state(cfg0, 2)
        s_eager, _ = make_fit_scan_batched(cfg0)(state, refs_chw, 4)
        cfg2 = cfg0.replace(rebin_margin=2.0)
        s_lazy, auxes = make_fit_scan_batched(cfg2)(state, refs_chw, 4)
        assert np.asarray(auxes.rebinned).shape == (4,)
        for f in ("pos", "sx", "sy", "rot", "color", "opacity"):
            np.testing.assert_allclose(
                np.asarray(getattr(s_lazy.params, f)),
                np.asarray(getattr(s_eager.params, f)),
                rtol=1e-4, atol=2e-4, err_msg=f)
