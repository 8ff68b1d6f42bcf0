"""Unit tests for the multi-chip collective-accounting tool
(scripts/analyze_collectives.py — VERDICT r04 #2: the degenerate-mesh
guard must be tested, and the HLO parser / ring models are load-bearing
for the published scaling tables in ROUND_NOTES/ARCHITECTURE)."""
import importlib.util
import os.path as osp

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "analyze_collectives",
    osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
             "scripts", "analyze_collectives.py"),
)
ac = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(ac)


class TestDegenerateMeshGuard:
    def test_sp_train_refused_below_four_devices(self):
        """('data'=2,'spatial'=1) is a zero-halo dp program: the tool must
        refuse to report it as sp-train rather than print a wrong row."""
        for n in (1, 2, 3, 7):  # odd n also refused (non-integer axis)
            reason = ac.degenerate_mesh_guard("sp-train", n)
            assert reason is not None and "refusing" in reason, (n, reason)

    def test_valid_meshes_pass(self):
        for n in (4, 8, 16):
            assert ac.degenerate_mesh_guard("sp-train", n) is None
        for name in ("dp-train", "sp-infer", "fp-replay", "grid-update"):
            assert ac.degenerate_mesh_guard(name, 2) is None


class TestHloParsing:
    def test_parse_collectives_ops_and_bytes(self):
        hlo = "\n".join([
            "ENTRY %main (p0: f32[64]) -> f32[64] {",
            "  %ar = f32[64]{0} all-reduce(%p0), replica_groups={{0,1}}",
            "  %ag = (f32[2,3]{1,0}, bf16[4]{0}) all-gather(%a, %b)",
            "  %cp.1 = f32[8,16]{1,0} collective-permute-start(%x)",
            "  %cp.2 = f32[8,16]{1,0} collective-permute-done(%cp.1)",
            "  %nop = f32[64]{0} add(%ar, %ar)",
            "}",
        ])
        rows = ac.parse_collectives(hlo)
        ops = sorted(r["op"] for r in rows)
        # -start counted once, -done skipped, add ignored
        assert ops == ["all-gather", "all-reduce", "collective-permute"]
        by = {r["op"]: r["bytes"] for r in rows}
        assert by["all-reduce"] == 64 * 4
        assert by["all-gather"] == 2 * 3 * 4 + 4 * 2  # f32[2,3] + bf16[4]
        assert by["collective-permute"] == 8 * 16 * 4

    def test_ring_wire_model(self):
        rows = [
            {"op": "all-reduce", "bytes": 1000},
            {"op": "collective-permute", "bytes": 500},
            {"op": "all-gather", "bytes": 800},
        ]
        n = 4
        want = 2 * 1000 * 3 / 4 + 500 + 800 * 3 / 4
        assert ac.wire_bytes_per_chip(rows, n) == pytest.approx(want)

    def test_expected_scaling_models(self):
        # weak scaling (dp): zero wire -> exactly n-fold speedup
        est = ac.expected_scaling("dp-train", [], 8)
        assert est["expected_speedup"] == pytest.approx(8.0)
        assert est["model"] == "fixed"
        # strong scaling: zero wire -> n-fold; wire halves it when
        # t_wire == t_comp
        est = ac.expected_scaling("fp-replay", [], 4)
        assert est["expected_speedup"] == pytest.approx(4.0)
        ms = ac.MEASURED_MS["fp-replay"]["ms"]
        gbps = 2 * ac.V5E["ici_link_gbps_oneway"]
        t_comp_ms = ms / 4
        # bytes that cost exactly t_comp of wire: permute moves b once
        b = t_comp_ms * gbps * 1e6
        est = ac.expected_scaling(
            "fp-replay", [{"op": "collective-permute", "bytes": b}], 4
        )
        assert est["expected_speedup"] == pytest.approx(2.0, rel=1e-3)
