"""The bench contamination sentinel (r06 verdict item 1): a recorded
run whose mid-run calibration probes betray concurrent load must be
REJECTED — no stdout summary line, exit 3 — so the driver never records
a contaminated number as BENCH_r*.json. The r06 record (531.6 s vs a
228.6 s quiet re-run of identical code) passed its before-pass probe;
only an interleaved probe can see that failure mode."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_contamination_verdict_pure():
    bench = _load_bench()
    # clean: BOTH measured quiet-box hot-heap patterns (runs 1 and 2,
    # 2026-08-15) must NOT reject — these exact series falsely tripped
    # the first two pre-probe-relative guard designs (mids sit 1.4-1.8x
    # above the volatile pre value but spread <= 1.27x internally)
    quiet1 = [0.8567, 0.8179, 0.6531, 0.7257, 0.6853,
              0.7296, 0.6441, 0.6116, 0.7316]
    quiet2 = [0.8295, 0.8401, 0.7897, 0.7224, 0.6903,
              0.78, 0.6898, 0.7152, 0.6621]
    assert bench.contamination_verdict(0.526, quiet1) == []
    assert bench.contamination_verdict(0.472, quiet2) == []
    # load arriving mid-run: probes in the loaded window spike vs the
    # run's own quiet floor (the r06 failure mode)
    assert bench.contamination_verdict(0.5, [0.62, 0.65, 1.9, 2.4, 0.7]) \
        == [1.9, 2.4]
    # boundary: exactly 2x the floor is NOT contamination (>)
    assert bench.contamination_verdict(0.5, [0.6, 1.2]) == []
    assert bench.contamination_verdict(0.5, [0.6, 1.21]) == [1.21]
    # the pre-run probe value is NOT part of the verdict (hot-heap tax
    # makes it apples-to-oranges) — identical mids, any pre, same answer
    assert bench.contamination_verdict(99.0, [0.6, 1.21]) == [1.21]
    assert bench.contamination_verdict(0.0, [0.6, 0.7]) == []
    # fewer than 2 mid probes (tiny registry): no internal baseline
    assert bench.contamination_verdict(0.6, []) == []
    assert bench.contamination_verdict(0.6, [5.0]) == []


def _run_main_with_fake_bench(monkeypatch, tmp_path, mid_probes):
    """Drive bench.main() end-to-end with bench() stubbed to a synthetic
    measurement: exercises the real reject/accept branch, the history
    append, the detail file, and the stdout contract."""
    bench = _load_bench()
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    monkeypatch.setattr(
        bench,
        "bench",
        lambda sf_dir: (
            {"q1": 1.0, "q2": 2.0},
            {"q1": [1.0], "q2": [2.0]},
            [0.6, 0.6, 0.6] + mid_probes,
            0.6,
            mid_probes,
        ),
    )
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    return bench


def test_main_rejects_contaminated_run(monkeypatch, tmp_path, capfd):
    bench = _run_main_with_fake_bench(
        monkeypatch, tmp_path, mid_probes=[0.62, 1.8, 0.61]
    )
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 3
    out, err = capfd.readouterr()
    # the driver-parsed stdout carries NO summary JSON line
    assert '"metric"' not in out
    assert "CONTAMINATED" in err
    # evidence persisted: detail file flags it, history records the reject
    detail = json.load(open(tmp_path / "BENCH_DETAIL.json"))
    assert detail["contaminated"] is True
    assert detail["contamination_offenders"] == [1.8]
    hist = open(tmp_path / "BENCH_HISTORY.md").read()
    assert "CONTAMINATED RUN REJECTED" in hist


def test_main_accepts_clean_run(monkeypatch, tmp_path, capfd):
    bench = _run_main_with_fake_bench(
        monkeypatch, tmp_path, mid_probes=[0.62, 0.7, 0.61]
    )
    bench.main()
    out, _err = capfd.readouterr()
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["metric"] == "total_query_time"
    assert summary["contaminated"] is False
    assert summary["pre_probe_sec"] == 0.6
    assert summary["value"] == 3.0
    detail = json.load(open(tmp_path / "BENCH_DETAIL.json"))
    assert detail["contaminated"] is False


def test_main_force_overrides_reject(monkeypatch, tmp_path, capfd):
    bench = _run_main_with_fake_bench(
        monkeypatch, tmp_path, mid_probes=[0.6, 1.8]
    )
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FORCE", "1")
    bench.main()
    out, _err = capfd.readouterr()
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    summary = json.loads(line)
    # forced runs still CARRY the flag so the record is honest
    assert summary["contaminated"] is True


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))
