"""bench.py harness logic: oracle-baseline provenance resolution and the
off-default-config guard that keeps A/B runs from consuming or overwriting
the stale-fallback bank (round-3 advisor finding: a MOM_TPU_BIN_RADIX=1 run
silently overwrote the default-path BENCH_BANK.json)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench


def test_oracle_baseline_prefers_measured(tmp_path, monkeypatch):
    bank = [{"n_points": 262_144, "resolution": "512x512",
             "iters_per_sec": 0.0445, "measured_at": "t"}]
    p = tmp_path / "ORACLE_BANK.json"
    p.write_text(json.dumps(bank))
    monkeypatch.setattr(bench, "ORACLE_BANK_PATH", str(p))

    ips, prov = bench._oracle_baseline(262_144, "512x512")
    assert ips == 0.0445 and prov["provenance"] == "measured"

    # same resolution, other point count: linear-in-P rescale of the
    # measured number (beats the round-1 65k anchor)
    ips2, prov2 = bench._oracle_baseline(524_288, "512x512")
    assert abs(ips2 - 0.0445 / 2) < 1e-9
    assert "rescale" in prov2["provenance"]

    # different resolution: falls back to the round-1 anchor extrapolation
    ips3, prov3 = bench._oracle_baseline(262_144, "1280x720")
    assert abs(ips3 - bench.ORACLE_IPS_65K * bench.ORACLE_PTS / 262_144) < 1e-9
    assert "round-1" in prov3["provenance"]


def test_oracle_baseline_missing_bank(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "ORACLE_BANK_PATH",
                        str(tmp_path / "nope.json"))
    ips, prov = bench._oracle_baseline(65_536, "512x512")
    assert abs(ips - bench.ORACLE_IPS_65K) < 1e-9
    assert "extrapolation" in prov


def test_off_default_config_gate_envs(monkeypatch):
    for var in bench.GATE_ENV_VARS + ("MOM_TPU_BENCH_PTS",
                                      "MOM_TPU_BENCH_RES",
                                      "MOM_TPU_BENCH_CPU"):
        monkeypatch.delenv(var, raising=False)
    assert not bench._off_default_config()
    monkeypatch.setenv("MOM_TPU_BIN_V2", "1")
    assert bench._off_default_config()
    assert bench._active_gates() == {"MOM_TPU_BIN_V2": "1"}
