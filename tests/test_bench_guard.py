"""The bench contamination sentinel (r06 verdict item 1): a run during
which foreign processes consumed a material share of the box must be
REJECTED — no stdout summary line, exit 3 — so the driver never records
a contaminated number as BENCH_r*.json. The r06 record (531.6 s vs a
228.6 s quiet re-run of identical code) was inflated by concurrent load
invisible to a before-pass probe; the detector measures that load
DIRECTLY as /proc/stat box CPU minus hypervisor steal minus this
process tree's CPU. Steal is excluded from the reject (host throttling
a rerun can never avoid — measured ~24% of this box at full load) and
reported as steal_cpu_share instead. (Three probe-relative designs
were tried first and rejected clean runs — see bench.py's
contamination docstrings.)"""

from __future__ import annotations

import importlib.util
import json
import multiprocessing
import os
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_foreign_cpu_share_pure():
    bench = _load_bench()
    # quiet box: tree consumed everything the box consumed
    assert bench.foreign_cpu_share(100.0, 100.0, 10.0, 32) == 0.0
    # accounting jitter can make tree > busy: clamps at 0, never negative
    assert bench.foreign_cpu_share(100.0, 103.0, 10.0, 32) == 0.0
    # r06-style: half the box burned by someone else for the whole run
    share = bench.foreign_cpu_share(320.0, 160.0, 10.0, 32)
    assert abs(share - 0.5) < 1e-9
    # an 8%-of-box intruder sits exactly at the threshold boundary
    share = bench.foreign_cpu_share(160.0, 160.0 - 25.6, 10.0, 32)
    assert abs(share - 0.08) < 1e-9
    # degenerate window never divides by zero
    assert bench.foreign_cpu_share(1.0, 0.0, 0.0, 32) == 0.0
    assert bench.foreign_cpu_share(1.0, 0.0, 1.0, 0) == 0.0
    # hypervisor steal is host throttling, not an in-VM foreign
    # process: a fully-loaded tree on a host-capped box (busy = tree +
    # steal) must read ZERO foreign, however large the steal
    assert bench.foreign_cpu_share(
        320.0, 240.0, 10.0, 32, steal_delta=80.0
    ) == 0.0
    # ...while a real intruder still surfaces undiminished after the
    # steal subtraction (half the box foreign + 10% stolen)
    share = bench.foreign_cpu_share(
        320.0 + 32.0, 160.0, 10.0, 32, steal_delta=32.0
    )
    assert abs(share - 0.5) < 1e-9


def test_tree_cpu_accounting_sees_foreign_burn():
    """End-to-end on the real /proc counters: a CPU burner OUTSIDE our
    measurement tree must show up as foreign share, and our own burn
    must NOT."""
    bench = _load_bench()
    ncpus = os.cpu_count() or 1

    def burn(seconds: float) -> None:
        end = time.time() + seconds
        while time.time() < end:
            pass

    # (a) our own burn is attributed to the tree -> near-zero foreign
    busy0, tree0, w0 = (
        bench.box_busy_seconds(), bench.tree_cpu_seconds(), time.time(),
    )
    procs = [multiprocessing.Process(target=burn, args=(1.0,))
             for _ in range(2)]
    [p.start() for p in procs]
    [p.join() for p in procs]
    share_own = bench.foreign_cpu_share(
        bench.box_busy_seconds() - busy0,
        bench.tree_cpu_seconds() - tree0,
        time.time() - w0,
        ncpus,
    )
    # reaped children land in our cutime/cstime; tolerance for harness
    # background activity on a shared box
    assert share_own < 0.06, share_own

    # (b) a detached burner (daemonized via double-fork so it leaves our
    # tree) reads as foreign
    pid = os.fork()
    if pid == 0:  # child: detach and burn
        if os.fork() == 0:  # grandchild, reparented to init
            end = time.time() + 1.5
            while time.time() < end:
                pass
            os._exit(0)
        os._exit(0)
    os.waitpid(pid, 0)  # reap the intermediate child immediately
    busy0, tree0, w0 = (
        bench.box_busy_seconds(), bench.tree_cpu_seconds(), time.time(),
    )
    time.sleep(1.2)  # the grandchild burns one full core meanwhile
    share_foreign = bench.foreign_cpu_share(
        bench.box_busy_seconds() - busy0,
        bench.tree_cpu_seconds() - tree0,
        time.time() - w0,
        ncpus,
    )
    # one core of ncpus for the window ~= 1/ncpus of the box
    assert share_foreign > 0.5 / ncpus, (share_foreign, ncpus)


def _run_main_with_fake_bench(monkeypatch, tmp_path, share):
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
            [0.6, 0.6, 0.6, 0.65, 0.7],
            0.6,
            [0.65, 0.7],
            share,
            0.02,
            24.1,
        ),
    )
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    return bench


def test_main_rejects_contaminated_run(monkeypatch, tmp_path, capfd):
    bench = _run_main_with_fake_bench(monkeypatch, tmp_path, share=0.42)
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 3
    out, err = capfd.readouterr()
    # the driver-parsed stdout carries NO summary JSON line
    assert '"metric"' not in out
    assert "CONTAMINATED" in err and "42.0%" in err
    # evidence persisted: detail file flags it, history records the reject
    detail = json.load(open(tmp_path / "BENCH_DETAIL.json"))
    assert detail["contaminated"] is True
    assert detail["foreign_cpu_share"] == 0.42
    hist = open(tmp_path / "BENCH_HISTORY.md").read()
    assert "CONTAMINATED RUN REJECTED" in hist


def test_main_accepts_clean_run(monkeypatch, tmp_path, capfd):
    bench = _run_main_with_fake_bench(monkeypatch, tmp_path, share=0.02)
    bench.main()
    out, _err = capfd.readouterr()
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["metric"] == "total_query_time"
    assert summary["contaminated"] is False
    assert summary["foreign_cpu_share"] == 0.02
    assert summary["value"] == 3.0
    detail = json.load(open(tmp_path / "BENCH_DETAIL.json"))
    assert detail["contaminated"] is False


def test_main_force_overrides_reject(monkeypatch, tmp_path, capfd):
    bench = _run_main_with_fake_bench(monkeypatch, tmp_path, share=0.42)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FORCE", "1")
    bench.main()
    out, _err = capfd.readouterr()
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    summary = json.loads(line)
    # forced runs still CARRY the flag so the record is honest
    assert summary["contaminated"] is True


def test_flag_regressions_slow_box_vs_genuine(tmp_path):
    """The r07 false-flag scenario, unit-tested: a uniformly slow box
    (every query 1.5×, calib ratio 1.5) must produce ZERO flags, while
    a genuine single-query 3× regression on a normal box is caught."""
    bench = _load_bench()
    base = {"qa": 1.0, "qb": 2.0, "qc": 4.0, "qd": 0.2}
    slow_box = {n: round(t * 1.5, 4) for n, t in base.items()}
    assert bench.flag_regressions(slow_box, base, ratio=1.5) == []
    regressed = dict(base, qb=6.0)
    flags = bench.flag_regressions(regressed, base, ratio=1.0)
    assert [f[0] for f in flags] == ["qb"]
    # sub-0.5 s queries never flag (noise floor), whatever the ratio
    tiny = dict(base, qd=0.45)
    assert bench.flag_regressions(tiny, base, ratio=1.0) == []


def test_clean_history_filters_degraded_and_contaminated(
    monkeypatch, tmp_path
):
    bench = _load_bench()
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    rows = [
        {"eff_cores": 30.1, "contaminated": False, "calib_sec": 0.4,
         "queries": {"qa": 1.0}},
        {"eff_cores": 24.0, "contaminated": False, "calib_sec": 0.5,
         "queries": {"qa": 2.5}},   # below CAPACITY_FLOOR — excluded
        {"eff_cores": 30.5, "contaminated": True, "calib_sec": 0.4,
         "queries": {"qa": 3.0}},   # contaminated — excluded
        {"eff_cores": 29.5, "contaminated": False, "calib_sec": 0.42,
         "queries": {"qa": 1.2}},
        {"eff_cores": 31.0, "contaminated": False, "calib_sec": 0.38,
         "queries": {"qa": 0.9}},
        {"eff_cores": 30.8, "contaminated": False, "calib_sec": 0.55,
         "steal_cpu_share": 0.42,
         "queries": {"qa": 4.0}},   # heavy steal (HOST-DEGRADED row
                                    # despite eff_cores ≥ floor) —
                                    # excluded (ADVICE r08)
    ]
    with open(tmp_path / "BENCH_TIMINGS.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    clean = bench.load_clean_history()
    assert [r["eff_cores"] for r in clean] == [30.1, 29.5, 31.0]
    base, calib = bench.history_baseline(clean)
    assert base == {"qa": 1.0}
    assert calib == 0.4


def test_main_flags_vs_history_median_not_single_run(
    monkeypatch, tmp_path, capfd
):
    """End-to-end: with 3 clean history rows whose q2 median is 0.5 s
    and whose LAST row already shows q2 elevated (2.1 s — so the flag
    persists two consecutive runs), a run where q2 reads 2.0 s flags it
    against the MEDIAN (labelled so), appends its own row to the
    timings log, and prints eff_cores next to the flag line."""
    bench = _run_main_with_fake_bench(monkeypatch, tmp_path, share=0.02)
    with open(tmp_path / "BENCH_TIMINGS.jsonl", "w") as f:
        for t in (0.5, 0.45, 2.1):
            f.write(json.dumps({
                "sf": 0.01, "eff_cores": 30.0, "contaminated": False,
                "calib_sec": 0.6, "queries": {"q1": 1.0, "q2": t},
            }) + "\n")
    bench.main()
    capfd.readouterr()
    hist = open(tmp_path / "BENCH_HISTORY.md").read()
    assert "vs median of last 3 clean runs" in hist
    assert "persisted 2 consecutive runs" in hist
    assert "q2 0.50→2.00s" in hist
    assert "eff_cores=24.1" in hist
    log = [
        json.loads(ln)
        for ln in open(tmp_path / "BENCH_TIMINGS.jsonl")
    ]
    assert len(log) == 4 and log[-1]["queries"]["q2"] == 2.0


def test_single_run_spike_is_outlier_not_regression(
    monkeypatch, tmp_path, capfd
):
    """The r09 driver-row scenario (verdict item 4): a query spikes in
    THIS run only — every prior clean run has it at baseline. It must
    print on the single-run-outlier line, with the regression line
    reading none."""
    bench = _run_main_with_fake_bench(monkeypatch, tmp_path, share=0.02)
    with open(tmp_path / "BENCH_TIMINGS.jsonl", "w") as f:
        for t in (0.5, 0.45, 0.55):
            f.write(json.dumps({
                "sf": 0.01, "eff_cores": 30.0, "contaminated": False,
                "calib_sec": 0.6, "queries": {"q1": 1.0, "q2": t},
            }) + "\n")
    bench.main()
    capfd.readouterr()
    hist = open(tmp_path / "BENCH_HISTORY.md").read()
    assert "Per-query regressions beyond drift (vs median of last 3 " \
           "clean runs)" in hist and ": none" in hist
    assert "Single-run outliers (NOT flagged" in hist
    assert "q2 0.50→2.00s" in hist


def test_split_regressions_persistence_gate():
    """Pure-function contract: a candidate confirms only when the
    previous clean run also exceeded the threshold vs the baseline."""
    bench = _load_bench()
    regs = [("qa", 3.0, 1.0), ("qb", 2.0, 1.0)]
    prev = {"qa": 2.8, "qb": 1.05}   # qa was already slow; qb was clean
    confirmed, outliers = bench.split_regressions(regs, prev, 1.0)
    assert [c[0] for c in confirmed] == ["qa"]
    assert [o[0] for o in outliers] == ["qb"]
    # a query absent from the previous run can only be an outlier
    confirmed, outliers = bench.split_regressions(
        [("qc", 3.0, 1.0)], {}, 1.0
    )
    assert confirmed == [] and [o[0] for o in outliers] == ["qc"]
    # host drift in the PREVIOUS run raises ITS threshold too
    confirmed, _ = bench.split_regressions(
        [("qa", 3.0, 1.0)], {"qa": 1.5}, 2.0
    )
    assert confirmed == []   # 1.5/1.0 < 2.0*1.15


def test_main_warns_on_heavy_steal(monkeypatch, tmp_path, capfd):
    """ADVICE r07: steal stays non-rejecting, but a >30%-steal run must
    print a prominent warning and mark its history row HOST-DEGRADED."""
    bench = _load_bench()
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    monkeypatch.setattr(
        bench,
        "bench",
        lambda sf_dir: (
            {"q1": 1.0}, {"q1": [1.0]}, [0.6] * 3, 0.6, [], 0.02, 0.35,
            20.0,
        ),
    )
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    bench.main()
    out, err = capfd.readouterr()
    assert "WARNING" in err and "steal" in err
    hist = open(tmp_path / "BENCH_HISTORY.md").read()
    assert "HOST-DEGRADED" in hist
    assert "BELOW CAPACITY FLOOR" in hist
    # the row still lands in the timings log (marked by its eff_cores),
    # but will never be selected as a clean-history baseline row
    assert bench.load_clean_history() == []


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))


def test_capacity_estimate_survives_single_probe_dip(
    monkeypatch, tmp_path, capfd
):
    """VERDICT r08 item 4: one probe landing in a hypervisor dip must
    not floor-flag a run — the floor decision takes max(pre, post).
    Synthetic dip: pre reads 27.6 (below floor), post reads 30.5."""
    bench = _load_bench()
    assert bench.capacity_estimate(27.65, 30.5) == 30.5
    assert bench.capacity_estimate(30.5, 27.65) == 30.5
    # sustained capping hits both ends and still floors
    assert bench.capacity_estimate(24.0, 25.1) < bench.CAPACITY_FLOOR

    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    monkeypatch.setattr(
        bench,
        "bench",
        lambda sf_dir: (
            {"q1": 1.0}, {"q1": [1.0]}, [0.6] * 3, 0.6, [], 0.02, 0.01,
            (27.65, 30.5),   # the r08 anomaly shape
        ),
    )
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    bench.main()
    out, _ = capfd.readouterr()
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["eff_cores"] == 30.5
    assert summary["eff_cores_pre"] == 27.65
    assert summary["eff_cores_post"] == 30.5
    hist = open(tmp_path / "BENCH_HISTORY.md").read()
    assert "BELOW CAPACITY FLOOR" not in hist
    # the accepted row enters the clean history with the max value
    clean = bench.load_clean_history()
    assert len(clean) == 1 and clean[0]["eff_cores"] == 30.5


def test_clean_history_filters_mismatched_sf(monkeypatch, tmp_path):
    """A sf0.01 smoke run's row must never enter a sf0.1 baseline —
    its times would flag every query (r10)."""
    bench = _load_bench()
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    rows = [
        {"sf": 0.1, "eff_cores": 30.0, "contaminated": False,
         "calib_sec": 0.4, "queries": {"qa": 1.0}},
        {"sf": 0.01, "eff_cores": 30.0, "contaminated": False,
         "calib_sec": 0.4, "queries": {"qa": 0.1}},
        {"sf": 0.1, "eff_cores": 30.0, "contaminated": False,
         "calib_sec": 0.4, "queries": {"qa": 1.1}},
    ]
    with open(tmp_path / "BENCH_TIMINGS.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    clean = bench.load_clean_history(sf=0.1)
    assert [r["queries"]["qa"] for r in clean] == [1.0, 1.1]
    # sf=None (callers that want everything) keeps the old behavior
    assert len(bench.load_clean_history()) == 3
