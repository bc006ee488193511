#!/usr/bin/env python
"""Benchmark harness: runs the registered queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (driver-parseable — VERDICT.md r01 item 1):

* stdout carries EXACTLY ONE compact JSON line:
  ``{"metric": "total_query_time", "value": N, "unit": "sec",
  "sf": 0.1, "n_queries": 182, "median_sec": M,
  "queries": {<slowest 15>}, "detail_file": "BENCH_DETAIL.json"}``
  The driver's capture buffer held ~2000 chars in round 1, so the full
  per-query map (~4 KB) is written to ``BENCH_DETAIL.json`` instead of
  stdout, and only the slowest 15 ride inline.
* Everything else — Spark/JVM banners, warmup noise, progress — goes to
  stderr. The JVM writes to fd 1 directly, so fd 1 is redirected to fd 2
  at the OS level for the whole run and restored only for the final line.
* ``BENCH_HISTORY.md`` gets an appended per-run summary row so later
  rounds can diff per-query regressions at a glance.

Drift-proofing (VERDICT.md r05 item 2 — a ±15% host swing must not
masquerade as a plan regression):

* **Multi-sample estimator.** Every query is timed up to 3 times
  (slowest-first on the later passes, stopping at the time budget); the
  recorded number is the MEDIAN of 3 samples, or the MIN when budget
  only allowed 1-2 — an outlier-resistant estimate either way.
* **Calibration probe.** A fixed, fixture-independent Spark job runs
  before each pass; its three times quantify how fast THIS box is THIS
  run. The summary carries ``calib_sec`` (median) and ``calib_spread``
  (max/min of the probes) so a cross-round delta can first be divided
  by the calibration ratio before anyone calls it a regression.
* **Per-family decomposition.** Queries are bucketed into stable
  families (relational / text / dedup / similarity / streaming / ...)
  and the per-family subtotals — plus a diff against the previous run's
  ``BENCH_DETAIL.json`` — are appended to ``BENCH_HISTORY.md``
  automatically (the r05 forensics, mechanized): a host-drift swing
  moves every family uniformly; a plan regression is family-local.

Contamination sentinel (VERDICT.md r06 item 1 — the r06 recorded run
was 2.3× slow from concurrent load DURING the passes, invisible to a
before-pass probe):

* The calibration probe is INTERLEAVED into the timed region — once
  every ``PROBE_EVERY`` queries in every pass — so load arriving
  mid-run is observed, not inferred.
* If any mid-run probe exceeds ``CONTAMINATION_RATIO`` (2×) of the
  run's own QUIETEST mid-run probe, the run is CONTAMINATED: bench.py
  appends a rejected-run row to ``BENCH_HISTORY.md``, writes the
  evidence to ``BENCH_DETAIL.json`` with ``"contaminated": true``,
  prints NO summary JSON, and exits 3 — so the driver never records
  the number as ``BENCH_r*.json``. ``SPARK_GRAFT_BENCH_FORCE=1``
  overrides. (The baseline is run-internal because in-run probes sit
  systematically 1.4-1.8× above the pre-run probe on a measured quiet
  box — hot-heap tax — while their internal spread stays ≤ 1.27×;
  load uniform from before the run is the cross-run drift ratio's
  job, as before.)

Each query is materialized via ``df.collect()`` (every registered query
returns an aggregate or bounded top-k), so the measured time covers scan →
shuffle → result, not just plan construction. A warmup pass on sf0.001
amortizes JVM/codegen startup out of the per-query numbers.
"""

from __future__ import annotations

import datetime
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
WARMUP_SF_DIR = "/root/testdata/sf0.001"
INLINE_SLOWEST = 15
MAX_SAMPLES = 3
PROBE_EVERY = 25          # interleave a calibration probe every N queries
CONTAMINATION_RATIO = 2.0  # mid-run probe > ratio × min(mid-run) ⇒ reject

# Stable query families for the decomposition. First match wins; rules are
# on NAME ONLY so a query never silently changes family across rounds.
_FAMILY_RULES: list[tuple[str, str]] = [
    (r"_stream$|^user_profiles_stream$", "streaming"),
    (r"^(ledger|pending|applied|checksum|rollback|after_version|upsert"
     r"|findings|severity|rule_catalog)", "ledger"),
    (r"^(dedup|simhash|minhash|ngram_jaccard|winnowing|moss|containment"
     r"|duplicate_spans|exact_substr|strip_dup|contamination|jaccard"
     r"|entity_canonicalize|fuzzy_name)", "dedup"),
    (r"^(similarity|ann_|semdedup|pq_codes|hash_embed|embedding|kmeans"
     r"|label_centroids|mmr|retrieval|bm25|keyword_search|hybrid_search"
     r"|label_propagation)", "similarity"),
    (r"^(text|token|quality|lang|doc_|vocab|bigram|unigram|bpe|top_terms"
     r"|corpus|repetition|pii|clean|pack_sequences|augment|typo"
     r"|multimodal|source_)", "text"),
    (r"^(pagerank|triangle|graph_)", "graph"),
    (r"^(events|funnel|user_|hourly|latest_event|zscore|value_outliers"
     r"|mad_outliers|count_min|scd2|cdc)", "events"),
    (r"^(approx|sampled_quantiles|bloom|key_skew|zorder|forecast"
     r"|deterministic_sample|stratified|weighted_sample|train_val)", "ops"),
]


def family(name: str) -> str:
    for pat, fam in _FAMILY_RULES:
        if re.search(pat, name):
            return fam
    return "relational"


def calibration_probe(spark) -> float:
    """Fixed fixture-independent job: generate → hash → shuffle-agg →
    collect. Measures JVM+shuffle+host speed, never the fixtures."""
    from pyspark.sql import functions as F

    start = time.perf_counter()
    (
        spark.range(0, 8_000_000, 1, 32)
        .select(
            (F.col("id") % 1000).alias("k"),
            # pmod keeps the ANSI-mode sum far from long overflow
            F.pmod(F.xxhash64(F.col("id")), F.lit(1000003)).alias("h"),
        )
        .groupBy("k")
        .agg(F.sum("h").alias("s"), F.count(F.lit(1)).alias("n"))
        .orderBy("k")
        .collect()
    )
    return time.perf_counter() - start


def run_query(fn, spark, sf_dir: str) -> float:
    start = time.perf_counter()
    df = fn(spark, sf_dir)
    df.collect()
    return time.perf_counter() - start


def estimate(samples: list[float]) -> float:
    """Median of 3 samples; min below that (both outlier-resistant)."""
    if len(samples) >= MAX_SAMPLES:
        return statistics.median(samples)
    return min(samples)


def contamination_verdict(
    pre_probe: float,
    mid_probes: list[float],
    ratio: float = CONTAMINATION_RATIO,
) -> list[float]:
    """Mid-run probes that betray load ARRIVING DURING the run (the r06
    failure mode: the before-pass probe read fast while queries mid-run
    ran 2-10x slow). The baseline is the run's OWN quietest mid-probe —
    never the pre-run probe: two instrumented quiet-box runs measured
    in-run probes sitting systematically 1.4-1.8x above the pre value
    (hot-heap GC pressure from resident session-shared dataframes; pre
    0.526/0.472 s vs mids 0.61-0.86 s on runs whose totals matched the
    clean trend exactly) while the mids' INTERNAL spread stayed <= 1.27x
    — so pre-relative tests reject clean runs, floor-relative tests
    don't. Any probe > ``ratio`` x min(mid_probes) is an offender.

    Deliberately out of scope: load that is uniform from before the
    first query — that inflates pre and mids alike, reads as a slow
    box, and is already surfaced by BENCH_HISTORY's cross-run
    calibration drift ratio and per-query regression list (the r05
    machinery). ``pre_probe`` stays recorded for that cross-run story.
    Pure function so the reject path is unit-testable without an
    11-minute run."""
    del pre_probe  # recorded upstream; see docstring
    if len(mid_probes) < 2:
        return []
    floor = min(mid_probes)
    if floor <= 0:
        return []
    return [p for p in mid_probes if p / floor > ratio]


def bench(sf_dir: str) -> tuple[
    dict[str, float], dict[str, list[float]], list[float], float, list[float]
]:
    from database_migration_engine_spark.plans import QUERIES
    from database_migration_engine_spark.session import build_session

    spark = build_session(app_name="dbmig-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: run everything once at the smallest sf to trigger codegen,
    # Arrow init, and broadcast machinery outside the timed region.
    for fn in QUERIES.values():
        try:
            fn(spark, WARMUP_SF_DIR).collect()
        except Exception:
            pass
    calibration_probe(spark)  # warm the probe's codegen too

    bench_start = time.perf_counter()
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "420"))
    samples: dict[str, list[float]] = {}
    calib: list[float] = []
    mid_probes: list[float] = []

    # Pre-run probe: median of 3 — the reference speed of THIS box at
    # the moment the run starts. Mid-run probes are judged against it.
    pre = [round(calibration_probe(spark), 4) for _ in range(3)]
    pre_probe = statistics.median(pre)
    calib.extend(pre)

    def probe_mid() -> None:
        # median of 3 back-to-back probes per checkpoint: a single
        # full-GC pause or host blip can swallow ONE probe (observed
        # 2.56x on an otherwise-clean run), but not two of three;
        # sustained external load inflates all three. Raw samples stay
        # in calib for the record.
        ps = [round(calibration_probe(spark), 4) for _ in range(3)]
        calib.extend(ps)
        mid_probes.append(round(statistics.median(ps), 4))

    # Pass 1: one sample for every query (never budget-skipped — a
    # missing number is worse than a noisy one). Passes 2..MAX_SAMPLES:
    # slowest-first re-measures until the budget runs out, so the heavy
    # queries — where drift hurts most — get their median first. A
    # calibration probe is interleaved every PROBE_EVERY queries so
    # load arriving MID-RUN is measured (r06's contaminated record
    # passed its before-pass probe).
    for qi, (name, fn) in enumerate(QUERIES.items()):
        if qi and qi % PROBE_EVERY == 0:
            probe_mid()
        try:
            samples[name] = [round(run_query(fn, spark, sf_dir), 4)]
        except Exception as exc:  # pragma: no cover - report, don't die
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            samples[name] = [-1.0]
    for _pass in range(1, MAX_SAMPLES):
        if time.perf_counter() - bench_start > budget_s:
            break
        probe_mid()
        order = sorted(samples, key=lambda n: -min(samples[n]))
        for qi, name in enumerate(order):
            if samples[name][0] < 0:
                continue
            if time.perf_counter() - bench_start > budget_s:
                break
            if qi and qi % PROBE_EVERY == 0:
                probe_mid()
            try:
                samples[name].append(
                    round(run_query(QUERIES[name], spark, sf_dir), 4)
                )
            except Exception:  # pragma: no cover
                pass
    spark.stop()
    timings = {
        name: (-1.0 if s[0] < 0 else round(estimate(s), 4))
        for name, s in samples.items()
    }
    return timings, samples, calib, pre_probe, mid_probes


def summarize(
    timings: dict[str, float], sf: float | None, calib: list[float]
) -> dict:
    ok = sorted(t for t in timings.values() if t >= 0)
    total = round(sum(ok), 4)
    median = round(ok[len(ok) // 2], 4) if ok else None
    slowest = dict(
        sorted(
            ((n, t) for n, t in timings.items() if t >= 0),
            key=lambda kv: -kv[1],
        )[:INLINE_SLOWEST]
    )
    return {
        "metric": "total_query_time",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_failed": sum(1 for t in timings.values() if t < 0),
        "median_sec": median,
        "calib_sec": round(statistics.median(calib), 3) if calib else None,
        "calib_spread": (
            round(max(calib) / min(calib), 3) if calib and min(calib) > 0
            else None
        ),
        "queries": {n: round(t, 2) for n, t in slowest.items()},
        "detail_file": "BENCH_DETAIL.json",
    }


def family_totals(timings: dict[str, float]) -> dict[str, float]:
    fams: dict[str, float] = {}
    for name, t in timings.items():
        if t < 0:
            continue
        fams[family(name)] = round(fams.get(family(name), 0.0) + t, 2)
    return fams


def load_previous_detail() -> dict | None:
    try:
        with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def append_history(
    summary: dict,
    timings: dict[str, float],
    prev: dict | None,
) -> None:
    path = os.path.join(REPO, "BENCH_HISTORY.md")
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )
    lines = []
    if not os.path.exists(path):
        lines.append("# Bench history\n")
        lines.append(
            "One row per `bench.py` run; per-query detail in "
            "`BENCH_DETAIL.json` (overwritten each run).\n"
        )
    slow = ", ".join(f"{n} {t:.2f}s" for n, t in summary["queries"].items())
    lines.append(
        f"\n## {stamp} — sf={summary['sf']} total={summary['value']}s "
        f"n={summary['n_queries']} median={summary['median_sec']}s "
        f"calib={summary['calib_sec']}s spread={summary['calib_spread']}\n"
        f"Slowest: {slow}\n"
    )
    fams = family_totals(timings)
    prev_t = (prev or {}).get("queries", {})
    prev_fams = family_totals(
        {n: t for n, t in prev_t.items() if isinstance(t, (int, float))}
    )
    prev_calib = (prev or {}).get("calib_sec")
    ratio = (
        summary["calib_sec"] / prev_calib
        if summary["calib_sec"] and prev_calib
        else None
    )
    fam_cells = []
    for fam in sorted(fams):
        cell = f"{fam} {fams[fam]:.1f}s"
        if fam in prev_fams and prev_fams[fam] > 0:
            cell += f" ({fams[fam] / prev_fams[fam]:+.0%})".replace("+", "Δ")
        fam_cells.append(cell)
    lines.append("Families: " + ", ".join(fam_cells) + "\n")
    if ratio is not None:
        lines.append(
            f"Host-drift ratio vs previous run (calib/calib): {ratio:.2f} — "
            "family deltas near this ratio are drift, not regressions.\n"
        )
    if prev_t:
        regs = sorted(
            (
                (n, t, prev_t[n])
                for n, t in timings.items()
                if t > 0.5
                and isinstance(prev_t.get(n), (int, float))
                and prev_t[n] > 0
                and t / prev_t[n] > max(1.3, (ratio or 1.0) * 1.15)
            ),
            key=lambda x: -(x[1] / x[2]),
        )[:8]
        if regs:
            lines.append(
                "Per-query regressions beyond drift: "
                + ", ".join(f"{n} {p:.2f}→{t:.2f}s" for n, t, p in regs)
                + "\n"
            )
        else:
            lines.append("Per-query regressions beyond drift: none\n")
    with open(path, "a") as f:
        f.writelines(lines)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(match.group(1)) if match else None

    # OS-level stdout quarantine: the JVM and any stray library prints
    # write to fd 1 directly, so Python-level sys.stdout games are not
    # enough. Save fd 1, point it at stderr for the whole run, and restore
    # it only to emit the single JSON result line.
    saved_stdout = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = os.fdopen(os.dup(1), "w")
    try:
        prev = load_previous_detail()
        timings, samples, calib, pre_probe, mid_probes = bench(sf_dir)
    finally:
        sys.stdout.flush()
        os.dup2(saved_stdout, 1)
        sys.stdout = os.fdopen(saved_stdout, "w")

    offenders = contamination_verdict(pre_probe, mid_probes)
    forced = os.environ.get("SPARK_GRAFT_BENCH_FORCE") == "1"
    summary = summarize(timings, sf, calib)
    summary["pre_probe_sec"] = round(pre_probe, 3)
    summary["contaminated"] = bool(offenders)
    with open(os.path.join(REPO, "BENCH_DETAIL.json"), "w") as f:
        json.dump(
            {
                **summary,
                "queries": timings,
                "samples": samples,
                "calib_samples": calib,
                "mid_probes": mid_probes,
                "contamination_offenders": offenders,
                "families": family_totals(timings),
            },
            f,
            indent=1,
            sort_keys=True,
        )
    if offenders and not forced:
        # Refuse the number: no stdout JSON ⇒ the driver has nothing to
        # record as BENCH_r*.json. The evidence stays in the detail file
        # and a rejected-run row in the history.
        with open(os.path.join(REPO, "BENCH_HISTORY.md"), "a") as f:
            f.write(
                f"\n## CONTAMINATED RUN REJECTED — quietest mid-run "
                f"probe {min(mid_probes):.3f}s, offenders up to "
                f"{max(offenders):.3f}s "
                f"({max(offenders) / min(mid_probes):.2f}×, threshold "
                f"{CONTAMINATION_RATIO}×; pre-run probe {pre_probe:.3f}s); "
                f"total would have been {summary['value']}s over "
                f"{summary['n_queries']} queries. Re-run on a quiet box.\n"
            )
        print(
            f"bench: CONTAMINATED — {len(offenders)}/{len(mid_probes)} "
            f"mid-run probes exceeded {CONTAMINATION_RATIO}x the run's "
            f"quietest mid-run probe ({min(mid_probes):.3f}s); worst "
            f"{max(offenders):.3f}s. "
            "Refusing to emit a summary line; re-run on a quiet box "
            "(SPARK_GRAFT_BENCH_FORCE=1 overrides).",
            file=sys.stderr,
        )
        sys.exit(3)
    append_history(summary, timings, prev)
    line = json.dumps(summary, separators=(",", ":"))
    # Belt and braces: the driver's round-1 capture held ~2000 chars.
    assert len(line) < 1900, f"bench summary line too long: {len(line)}"
    print(line)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
