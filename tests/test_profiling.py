"""Stage profiler tests (runtime/profiling.py + the `profile` CLI).

CPU numbers are meaningless as performance, but the MECHANICS are fully
exercised: the NULL/forward/e2e programs AOT-compile and run, the
corrected stages derive, and the CLI writes the JSON report.
"""
import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

from test_runtime import small_cfg  # noqa: E402

from vision_semantic_segmentation_tpu.runtime.profiling import (  # noqa: E402
    format_report,
    profile_stages,
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


class TestProfileStages:
    def test_stages_measure_and_derive(self, tmp_path):
        cfg = _tiny_cfg(tmp_path)
        lines = []
        result = profile_stages(
            cfg,
            variables=_variables(cfg),
            image_hw=IMAGE_HW,
            window=2,
            n_windows=1,
            repeats=1,
            distortion="none",
            log=lines.append,
        )
        # raw stage times exist and are positive
        assert result["null_ms"] > 0
        assert result["forward_ms_raw"] > 0
        assert result["e2e_ms_raw"] > 0
        assert result["e2e_fps"] > 0
        # corrected stage is raw minus NULL, floored at zero (to rounding)
        assert abs(
            result["forward_ms"]
            - max(result["forward_ms_raw"] - result["null_ms"], 0.0)
        ) < 2e-3
        assert result["fusion_ms"] >= 0
        assert result["distortion"] == "none"
        # every stage reported to the log, and the summary line renders
        assert any("forward" in ln for ln in lines)
        assert any("e2e" in ln for ln in lines)
        summary = format_report(result)
        assert "fps" in summary and "forward" in summary

    def test_rejects_degenerate_window_counts(self, tmp_path):
        import pytest

        cfg = _tiny_cfg(tmp_path)
        with pytest.raises(ValueError, match="window"):
            profile_stages(cfg, image_hw=IMAGE_HW, window=0, n_windows=1)
        with pytest.raises(ValueError, match="n_windows"):
            profile_stages(cfg, image_hw=IMAGE_HW, window=2, n_windows=0)

    def test_confidence_path_profiles(self, tmp_path):
        cfg = _tiny_cfg(tmp_path)
        result = profile_stages(
            cfg,
            variables=_variables(cfg),
            image_hw=IMAGE_HW,
            window=2,
            n_windows=1,
            repeats=1,
            distortion="none",
            confidence_weighting=True,
        )
        assert result["confidence_weighting"] is True
        assert result["e2e_fps"] > 0


class TestProfileCLI:
    def test_cli_writes_json(self, tmp_path):
        from vision_semantic_segmentation_tpu.__main__ import main

        cfg = _tiny_cfg(tmp_path)
        cfg_path = str(tmp_path / "exp.yaml")
        with open(cfg_path, "w") as f:
            f.write(cfg.dump())
        out = str(tmp_path / "profile.json")
        result = main([
            "profile", "--cfg", cfg_path,
            "--height", "64", "--width", "96",
            "--window", "2", "--windows", "1", "--repeats", "1",
            "--distortion", "none", "--json", out,
        ])
        assert os.path.exists(out)
        with open(out) as f:
            saved = json.load(f)
        assert saved["e2e_fps"] == result["e2e_fps"]
        assert saved["image_hw"] == [64, 96]
