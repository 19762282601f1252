"""Windowed-expansion resident kernel (ops/render_pallas_window.py) vs the
resident and dense fused paths, in interpret mode on CPU.

The windowed expansion restricts the one-hot matmul to a per-tile splat-axis
window: for in-window columns the contraction over K is the identical
product sequence, so per-tile contributions are bitwise equal to the
resident kernel's; only the cross-tile accumulation association differs
(resident adds in grid order into one accumulator, window scatter-adds
per-tile blocks), so gradients match to ~1 ulp. Escaped pairs (ids past a
too-small window) must be counted, never silently lost.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs2d_tpu.config import SplatConfig
from gs2d_tpu.io.image import synthetic_target
from gs2d_tpu.ops import render_pallas as rp
from gs2d_tpu.ops import render_pallas_resident as rpr
from gs2d_tpu.ops import render_pallas_window as rpw
from gs2d_tpu.ops import tiles as tl
from tests.helpers import random_splats, to_params

H, W = 48, 64


def case(rng, n, **kw):
    cfg = SplatConfig(width=W, height=H, n_splats=n, **kw)
    s = random_splats(rng, n, W, H)
    ref = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    return cfg, to_params(s), ref


def grads_close(got, want, rtol=0.0, atol_scale=1e-6):
    for f in ("pos", "sx", "sy", "rot", "color", "opacity"):
        a = np.asarray(getattr(want, f))
        b = np.asarray(getattr(got, f))
        atol = atol_scale * max(1.0, np.abs(a).max())
        np.testing.assert_allclose(b, a, rtol=rtol, atol=atol, err_msg=f)


class TestWindowKernel:
    # 130: pad id N=130 can land inside a top-edge window and must be
    # sliced away; 128: exact multiple.
    @pytest.mark.parametrize("n", [128, 130])
    def test_full_width_matches_resident(self, rng, n):
        """W = n_pad degenerates into the plain resident expansion."""
        cfg, p, ref = case(rng, n, max_splats_per_tile=64)
        cfg = cfg.replace(binning="window", window_width=rpw._n_pad(n))
        refc = rp.pad_ref_chw(jnp.asarray(ref), cfg)
        C_r, g_r, nd_r = rpr.l2_step_resident(p, refc, cfg, 64)
        C_w, g_w, nd_w = rpw.l2_step_window(p, refc, cfg, 64)
        np.testing.assert_array_equal(np.asarray(C_w), np.asarray(C_r))
        assert int(nd_w) == int(nd_r)  # zero escapes at full width
        grads_close(g_w, g_r)

    def test_tuned_window_matches_dense(self, rng):
        """Morton-ordered population, tuned (narrow) window: zero escapes
        and gradients equal to the dense fused path."""
        from gs2d_tpu.train.loop import TrainState, init_train_state
        from gs2d_tpu.train.reorder import reorder_state

        # alpha_cache pinned off: the window kernel has no G-cache, and the
        # dense kernel's cached replay fuses differently (<= 1 ulp drift,
        # test_fused.TestGCache) -- this test isolates the window expansion.
        cfg = SplatConfig(width=W, height=H, n_splats=256,
                          max_splats_per_tile=128, tile_h=8,
                          binning="window", alpha_cache=False)
        state = reorder_state(init_train_state(cfg), cfg)
        p = state.params
        cfg = rpw.tune_window(p, cfg)
        assert cfg.window_width is not None
        ref = synthetic_target(H, W)
        refc = rp.pad_ref_chw(jnp.asarray(ref), cfg)
        b = tl.bin_splats(p, cfg, 128)
        C_d, g_d = rp.l2_render_and_grads(b, refc, 256, cfg, p)
        C_w, g_w, nd = rpw.l2_step_window(p, refc, cfg, 128)
        np.testing.assert_array_equal(np.asarray(C_w), np.asarray(C_d))
        assert int(nd) == int(b.n_dropped)
        grads_close(g_w, g_d)

    def test_escaped_pairs_counted(self, rng):
        """A deliberately tiny window must count every live id past each
        tile's [base, base+W) as escaped (cross-checked in numpy), and the
        forward image must be unaffected (windows gate only gradients)."""
        cfg, p, ref = case(rng, 256, max_splats_per_tile=128)
        cfg = cfg.replace(binning="window", window_width=128)
        refc = rp.pad_ref_chw(jnp.asarray(ref), cfg)
        b = tl.bin_splats(p, cfg, 128, ids_only=True)
        ids = np.asarray(b.ids).reshape(-1, np.asarray(b.ids).shape[-1])
        live = ids >= 0
        min_id = np.where(live, ids, 256).min(axis=1)
        base = np.clip((min_id // 128) * 128, 0, rpw._n_pad(256) - 128)
        want = int((live & (ids >= base[:, None] + 128)).sum())
        assert want > 0, "case too easy: nothing escapes"
        C_w, _, nd = rpw.l2_step_window(p, refc, cfg, 128)
        assert int(nd) == want + int(b.n_dropped)
        C_r, _, _ = rpr.l2_step_resident(p, refc, cfg, 128)
        np.testing.assert_array_equal(np.asarray(C_w), np.asarray(C_r))

    def test_fused_step_dispatch(self, rng):
        """make_train_step_fused routes binning="window" through the
        windowed kernel and the step matches the resident step."""
        from gs2d_tpu.train.loop import init_train_state, make_train_step_fused

        n = 128
        cfg_w = SplatConfig(width=W, height=H, n_splats=n,
                            max_splats_per_tile=64, tile_h=32,
                            binning="window", window_width=rpw._n_pad(n))
        cfg_r = cfg_w.replace(binning="resident", window_width=None)
        ref = synthetic_target(H, W)
        state0 = init_train_state(cfg_w)
        refc = rp.pad_ref_chw(jnp.asarray(ref), cfg_w)
        s_w, aux_w = make_train_step_fused(cfg_w)(state0, refc)
        s_r, aux_r = make_train_step_fused(cfg_r)(state0, refc)
        assert float(aux_w.mse) == float(aux_r.mse)
        # Post-Adam params: gradient diffs are ~1 ulp (association order of
        # the cross-tile sum), which Adam amplifies to O(lr) on near-zero-
        # gradient params (CLAUDE.md); compare loosely.
        np.testing.assert_allclose(np.asarray(s_w.params.pos),
                                   np.asarray(s_r.params.pos),
                                   atol=2e-3)

    def test_tune_window_narrows_after_reorder(self, rng):
        """On a Morton-ordered population the tuned window is strictly
        narrower than the full splat axis (the point of the layout)."""
        from gs2d_tpu.train.loop import init_train_state
        from gs2d_tpu.train.reorder import reorder_state

        cfg = SplatConfig(width=256, height=192, n_splats=2048,
                          max_splats_per_tile=512, tile_h=8,
                          binning="window")
        state = reorder_state(init_train_state(cfg), cfg)
        tuned = rpw.tune_window(state.params, cfg)
        assert tuned.window_width < rpw._n_pad(2048), tuned.window_width
