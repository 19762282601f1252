"""Coverage for utility modules: visualization, profiling, image IO, mesh
helpers."""

import json
import os

import jax
import numpy as np

from gs2d_tpu.config import SplatConfig
from gs2d_tpu.io.image import load_asset, save_image, synthetic_target
from gs2d_tpu.params import init_params
from gs2d_tpu.parallel.mesh import make_mesh
from gs2d_tpu.parallel.multihost import default_pod_mesh
from gs2d_tpu.utils.profiling import (JsonlLogger, PhaseTimer,
                                      ThroughputCounter)
from gs2d_tpu.utils.visualize import overlay_splats


class TestVisualize:
    def test_overlay_draws_within_bounds(self):
        cfg = SplatConfig(width=64, height=48, n_splats=8)
        p = init_params(cfg)
        base = np.zeros((48, 64, 3), np.float32)
        img = overlay_splats(base, p, cfg)
        assert img.shape == base.shape
        assert img.max() > 0.0  # something was drawn
        assert img.min() >= 0.0 and img.max() <= 1.0

    def test_overlay_flags(self):
        cfg = SplatConfig(width=64, height=48, n_splats=4)
        p = init_params(cfg)
        base = np.zeros((48, 64, 3), np.float32)
        none = overlay_splats(base, p, cfg, draw_axes=False,
                              draw_ellipse=False, draw_bbox=False)
        np.testing.assert_array_equal(none, base)

    def test_overlay_info_text(self):
        """show_info draws the per-splat index:opacity readout (the
        reference's showSplatInfo toggle, main.cpp:479-484)."""
        cfg = SplatConfig(width=64, height=48, n_splats=4)
        p = init_params(cfg)
        base = np.zeros((48, 64, 3), np.float32)
        geo = overlay_splats(base, p, cfg, draw_axes=False,
                             draw_ellipse=False, draw_bbox=False)
        txt = overlay_splats(base, p, cfg, draw_axes=False,
                             draw_ellipse=False, draw_bbox=False,
                             show_info=True)
        assert (txt != geo).any()  # glyph pixels were added
        assert txt.max() <= 1.0


class TestProfiling:
    def test_phase_timer(self):
        t = PhaseTimer()
        with t.phase("a"):
            pass
        t.time("b", lambda: 1 + 1)
        s = t.summary()
        assert s["a"]["count"] == 1 and s["b"]["count"] == 1
        lines = []
        t.report(log=lines.append)
        assert len(lines) == 2

    def test_throughput_counter(self):
        tc = ThroughputCounter(100, 200, 1000)
        r = tc.rates(0.5)
        assert r["iters_per_s"] == 2.0
        assert r["pixels_per_s"] == 2 * 100 * 200 * 2
        assert r["gaussians_per_s"] == 2 * 1000 * 2

    def test_jsonl_logger(self, tmp_path):
        path = str(tmp_path / "m.jsonl")
        lg = JsonlLogger(path)
        lg.log(iter=1, mse=2.0)
        lg.log(iter=2, mse=1.0)
        lg.close()
        recs = [json.loads(line) for line in open(path)]
        assert [r["iter"] for r in recs] == [1, 2]
        assert all("t" in r for r in recs)

    def test_jsonl_logger_null(self):
        lg = JsonlLogger(None)
        lg.log(x=1)  # no-op, no crash
        lg.close()


class TestImageIO:
    def test_assets_decode(self):
        img = load_asset("squirrel_cls_mini.jpg")
        assert img.shape == (213, 268, 3)
        assert img.dtype == np.float32
        assert 0.0 <= img.min() and img.max() <= 1.0

    def test_save_roundtrip(self, tmp_path):
        from gs2d_tpu.io.image import load_image
        img = synthetic_target(32, 64)
        p = str(tmp_path / "x.png")
        save_image(p, img)
        back = load_image(p)
        np.testing.assert_allclose(back, img, atol=1.0 / 255.0)

    def test_synthetic_deterministic(self):
        a = synthetic_target(16, 16, seed=1)
        b = synthetic_target(16, 16, seed=1)
        np.testing.assert_array_equal(a, b)
        c = synthetic_target(16, 16, seed=2)
        assert np.abs(a - c).max() > 0


class TestMeshHelpers:
    def test_default_pod_mesh_covers_devices(self):
        mesh = default_pod_mesh()
        total = 1
        for v in mesh.shape.values():
            total *= v
        assert total == jax.device_count()

    def test_make_mesh_shape(self):
        mesh = make_mesh(data=2, tile=2, splat=2)
        assert mesh.shape == {"data": 2, "tile": 2, "splat": 2}
