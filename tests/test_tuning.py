"""Autotuner tests (runtime/tuning.py + the `autotune` CLI).

CPU timing numbers are meaningless as performance, but the MECHANICS are
fully exercised: every combination builds + AOT-compiles + runs the real
fused runner, the winner is selected, and the overlay round-trips
through yacs back into an engine with the chosen backends.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

from test_runtime import small_cfg  # noqa: E402

from vision_semantic_segmentation_tpu.config import get_cfg_defaults  # noqa: E402
from vision_semantic_segmentation_tpu.runtime.tuning import (  # noqa: E402
    generate_windows,
    overlay_yaml,
    tune,
    write_overlay,
)

IMAGE_HW = (64, 96)


def _tiny_cfg(tmp_path):
    cfg = small_cfg(tmp_path)
    cfg.MAPPING.POINT_BUCKET = 2048
    net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
    net_cfg.MODEL.TYPE = "Dummy"
    net_cfg.MODEL.COMPUTE_DTYPE = "float32"
    return cfg


def _variables(cfg):
    from vision_semantic_segmentation_tpu.models import build_model

    model = build_model(cfg.VISION_SEM_SEG.SEM_SEG_NETWORK)[0]
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3), jnp.float32))


class TestGenerateWindows:
    def test_points_inside_boundary(self, tmp_path):
        """Synthetic points must land inside the configured grid region."""
        cfg = _tiny_cfg(tmp_path)
        (win,) = generate_windows(cfg, IMAGE_HW, window=2, n_windows=1)
        assert win["image"].shape == (2, 64, 96, 3)
        assert win["pcd"].shape == (2, 4, 2048)
        from vision_semantic_segmentation_tpu.mapping import PCD_ORIGIN_OFFSET

        xy = np.asarray(win["pcd"][:, :2]) + np.asarray(
            PCD_ORIGIN_OFFSET[:2], np.float32
        ).reshape(1, 2, 1)
        (bx0, bx1), (by0, by1) = cfg.MAPPING.BOUNDARY
        assert xy[:, 0].min() >= bx0 and xy[:, 0].max() <= bx1
        assert xy[:, 1].min() >= by0 and xy[:, 1].max() <= by1

    def test_windows_are_distinct(self, tmp_path):
        cfg = _tiny_cfg(tmp_path)
        w0, w1 = generate_windows(cfg, IMAGE_HW, window=2, n_windows=2)
        assert not np.array_equal(np.asarray(w0["pcd"]), np.asarray(w1["pcd"]))


class TestTune:
    def test_tune_selects_and_overlay_roundtrips(self, tmp_path):
        cfg = _tiny_cfg(tmp_path)
        result = tune(
            cfg,
            variables=_variables(cfg),
            image_hw=IMAGE_HW,
            window=2,
            n_windows=1,
            repeats=1,
            combos=[("matmul", "bitonic"), ("scatter", "radix")],
            distortion="none",
        )
        assert len(result["rows"]) == 2
        assert all(r["fps"] > 0 for r in result["rows"])
        assert result["best"] in result["rows"]
        assert result["best"]["fps"] == max(r["fps"] for r in result["rows"])
        # the overlay merges cleanly and carries the winning backends
        path = write_overlay(result, str(tmp_path / "tuned.yaml"))
        merged = get_cfg_defaults()
        merged.merge_from_file(path)
        assert merged.MAPPING.FOLD_METHOD == result["best"]["fold"]
        assert merged.MAPPING.SORT_METHOD == result["best"]["sort"]
        # UPDATE_WINDOW was not swept -> not pinned by the overlay
        assert "UPDATE_WINDOW" not in overlay_yaml(result)

    def test_update_window_sweep_safe(self, tmp_path):
        """A footprint-covering window candidate is sweepable and lands in
        the overlay (RANGE_MAX=5 m @ 0.1 m -> required 110 <= 128)."""
        cfg = _tiny_cfg(tmp_path)
        cfg.MAPPING.PCD.RANGE_MAX = 5.0
        result = tune(
            cfg,
            variables=_variables(cfg),
            image_hw=IMAGE_HW,
            window=2,
            n_windows=1,
            repeats=1,
            combos=[("matmul", "bitonic")],
            update_windows=[0, 128],
            distortion="none",
        )
        assert len(result["rows"]) == 2
        assert {r["update_window"] for r in result["rows"]} == {0, 128}
        assert not any(r["lossy"] for r in result["rows"])
        text = overlay_yaml(result)
        assert "UPDATE_WINDOW" in text
        merged = get_cfg_defaults()
        merged.merge_from_file(str(write_overlay(result, str(tmp_path / "t.yaml"))))
        assert merged.MAPPING.UPDATE_WINDOW == result["best"]["update_window"]

    def test_lossy_window_never_wins(self, tmp_path):
        """A window below the worst-case frame footprint (2.2 * RANGE_MAX /
        RESOLUTION cells) drops points in production: it is timed and
        flagged but NEVER selected, even when faster."""
        cfg = _tiny_cfg(tmp_path)  # RANGE_MAX=100 @ 0.1 m -> required 2200
        result = tune(
            cfg,
            variables=_variables(cfg),
            image_hw=IMAGE_HW,
            window=2,
            n_windows=1,
            repeats=1,
            combos=[("matmul", "bitonic")],
            update_windows=[0, 128],
            distortion="none",
        )
        by_uw = {r["update_window"]: r for r in result["rows"]}
        assert by_uw[128]["lossy"] and not by_uw[0]["lossy"]
        assert result["best"]["update_window"] == 0

        import pytest

        with pytest.raises(ValueError, match="lossy"):
            tune(
                cfg, variables=_variables(cfg), image_hw=IMAGE_HW,
                window=2, n_windows=1, repeats=1,
                combos=[("matmul", "bitonic")], update_windows=[128],
                distortion="none",
            )

    def test_defaults_win_ties(self, tmp_path, monkeypatch):
        """Equal-fps rows keep the FIRST (shipped-defaults) combination —
        pinned through tune() itself, not Python's max()."""
        import vision_semantic_segmentation_tpu.runtime.tuning as tuning_mod

        order = []

        def fake_combo(cfg, variables, fold, sort, uw, windows, image_hw,
                       window, camera, repeats, distortion):
            order.append((fold, sort))
            return {
                "fold": fold, "sort": sort, "update_window": 0,
                "tuned_update_window": False, "lossy": False,
                "distortion": "none", "fps": 5.0, "ms_per_frame": 200.0,
                "warmup_s": 0.0,
            }

        monkeypatch.setattr(tuning_mod, "_time_combo", fake_combo)
        monkeypatch.setattr(tuning_mod, "generate_windows", lambda *a, **k: [])
        monkeypatch.setattr(tuning_mod, "init_variables", lambda *a, **k: {})
        result = tuning_mod.tune(_tiny_cfg(tmp_path), window=2, n_windows=1)
        assert order[0] == ("matmul", "bitonic")  # defaults probed first
        assert (result["best"]["fold"], result["best"]["sort"]) == (
            "matmul", "bitonic",
        )


class TestAutotuneCLI:
    def test_cli_writes_overlay(self, tmp_path):
        from vision_semantic_segmentation_tpu.__main__ import main

        cfg = _tiny_cfg(tmp_path)
        cfg_path = str(tmp_path / "exp.yaml")
        with open(cfg_path, "w") as f:
            f.write(cfg.dump())
        out = str(tmp_path / "tuned.yaml")
        result = main([
            "autotune", "--cfg", cfg_path, "--out", out,
            "--height", "64", "--width", "96",
            "--window", "2", "--windows", "1", "--repeats", "1",
            "--folds", "matmul", "--sorts", "bitonic,radix",
            "--distortion", "none",
        ])
        assert os.path.exists(out)
        assert len(result["rows"]) == 2
        merged = get_cfg_defaults()
        merged.merge_from_file(out)
        assert merged.MAPPING.SORT_METHOD in ("bitonic", "radix")
