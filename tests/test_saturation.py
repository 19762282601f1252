"""The in-kernel saturating walk must be bitwise-invisible: a tile whose
every pixel is saturated (T < 1/256) early in its splat list exercises the
exact early exit (render_pallas._saturating_loop), and the outputs must
equal the scan renderer's and the plain dense kernel's exactly."""

import jax.numpy as jnp
import numpy as np

from gs2d_tpu.config import SplatConfig
from gs2d_tpu.ops import render_pallas as rp
from gs2d_tpu.ops import render_pallas_flat as rpf
from gs2d_tpu.ops import tiles as tl
from gs2d_tpu.ops import tiles_flat as tlf
from gs2d_tpu.ops.render_jax import render_backward, render_forward
from gs2d_tpu.params import GaussianParams

H, W = 32, 128  # one 32x128 tile exactly (no padding pixels)


def opaque_stack(n=192):
    """n huge opaque splats covering the whole tile, then distinct tail
    splats whose contribution must be exactly zero post-saturation."""
    rng = np.random.default_rng(7)
    pos = np.stack([rng.uniform(20, 100, n), rng.uniform(8, 24, n)],
                   -1).astype(np.float32)
    return GaussianParams(
        pos=pos,
        sx=np.full((n,), 60.0, np.float32),
        sy=np.full((n,), 30.0, np.float32),
        rot=rng.uniform(0, np.pi, n).astype(np.float32),
        color=rng.uniform(0, 1, (n, 3)).astype(np.float32),
        opacity=np.full((n,), 1.0, np.float32),
    )


def test_saturated_tile_bitwise_flat_vs_scan(monkeypatch):
    # Force the saturating walk on (production gates it to deep lists).
    monkeypatch.setattr(rp, "SAT_WALK_THRESHOLD", 1)
    cfg = SplatConfig(width=W, height=H, n_splats=192, tile_h=32,
                      binning="flat")
    p = opaque_stack()
    ref = np.zeros((H, W, 3), np.float32)
    refc = rp.pad_ref_chw(jnp.asarray(ref), cfg)

    # Sanity: the tile really saturates well before the list ends.
    C1, T1 = render_forward(p, cfg)
    assert float(jnp.max(T1)) < cfg.min_throughput

    cfg = rpf.tune_flat_config(p, cfg)
    b = tlf.bin_splats_flat(p, cfg, cfg.flat_capacity, kc=cfg.flat_chunk,
                            max_chunks=cfg.flat_max_chunks)
    C, g = rpf.l2_render_and_grads_flat(
        b, refc, 192, cfg, cfg.flat_chunk, cfg.flat_max_chunks, params=p)
    g1 = render_backward(p, C1, C1 - jnp.asarray(ref), cfg)
    np.testing.assert_allclose(np.asarray(C), np.asarray(C1), atol=3e-7)
    for f in ("pos", "sx", "sy", "rot", "color", "opacity"):
        a, c = np.asarray(getattr(g1, f)), np.asarray(getattr(g, f))
        atol = 1e-4 * max(1.0, np.abs(a).max())
        np.testing.assert_allclose(c, a, atol=atol, err_msg=f)
    # Post-saturation splats: zero gradients, exactly.
    depth = np.cumsum(np.zeros(192)) * 0  # all cover the whole tile
    assert np.all(np.asarray(g.opacity)[-32:] == 0.0)


def test_saturated_tile_chunked_vs_plain_dense(monkeypatch):
    """Chunked dense kernel (saturating walk) == non-chunked (plain walk),
    bitwise, on a fully saturated tile.

    alpha_cache is pinned off: the chunked kernel always re-derives, and
    comparing it against the non-chunked kernel's G-cache replay would
    measure the documented <= 1 ulp cross-program fusion drift
    (test_fused.TestGCache) instead of the saturating walk this test
    isolates."""
    monkeypatch.setattr(rp, "SAT_WALK_THRESHOLD", 1)
    cfg = SplatConfig(width=W, height=H, n_splats=192, tile_h=32,
                      max_splats_per_tile=512,  # K>256 -> chunked
                      alpha_cache=False)
    p = opaque_stack()
    ref = np.zeros((H, W, 3), np.float32)
    refc = rp.pad_ref_chw(jnp.asarray(ref), cfg)
    b_chunked = tl.bin_splats(p, cfg, 512)
    C_c, g_c = rp.l2_render_and_grads(b_chunked, refc, 192, cfg, p)
    b_plain = tl.bin_splats(p, cfg, 192)  # K=192 -> single fused kernel
    C_p, g_p = rp.l2_render_and_grads(b_plain, refc, 192, cfg, p)
    np.testing.assert_array_equal(np.asarray(C_c), np.asarray(C_p))
    for f in ("pos", "sx", "sy", "rot", "color", "opacity"):
        np.testing.assert_array_equal(
            np.asarray(getattr(g_c, f)), np.asarray(getattr(g_p, f)),
            err_msg=f)
