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

* The reject decision is a DIRECT measurement of foreign load, not a
  probe heuristic: over the timed region, the box's consumed CPU
  seconds (/proc/stat) minus hypervisor steal minus this bench's own
  process tree's CPU seconds (/proc/<pid>/stat incl. the py4j JVM, its
  worker daemons, and reaped children) is the CPU in-VM foreign
  processes burned. Steal is excluded from the reject and REPORTED
  instead (``steal_cpu_share`` in the summary, ``steal=`` in the
  history row): it is host throttling a rerun can never avoid —
  measured ~24% of this box's capacity at full 32-thread load — and
  it slows the calibration probe identically, so the cross-run
  host-drift ratio normalizes steal-slowed totals. If in-VM foreign
  CPU exceeds ``FOREIGN_SHARE_MAX`` (8%) of the box's capacity, the
  run is CONTAMINATED: bench.py appends a rejected-run row to
  ``BENCH_HISTORY.md``, writes the evidence to ``BENCH_DETAIL.json``
  with ``"contaminated": true``, prints NO summary JSON, and exits 3 —
  so the driver never records the number as ``BENCH_r*.json``.
  ``SPARK_GRAFT_BENCH_FORCE=1`` overrides. (Probe-relative designs
  were tried and measured unusable: in-run probes carry a systematic
  1.4-1.8× hot-heap tax over the pre-run value and their checkpoint
  medians legitimately spread up to 3× with residual heap state, so
  any threshold tight enough to catch 2× contamination also rejected
  demonstrably-clean runs. The interleaved probes remain recorded as
  drift diagnostics.)

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
PROBE_EVERY = 25        # interleave a calibration probe every N queries
FOREIGN_SHARE_MAX = 0.08  # foreign CPU > 8% of the box ⇒ reject the run

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
     r"|multimodal|video_frame|source_)", "text"),
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


def box_busy_seconds() -> float:
    """Whole-box consumed CPU seconds since boot (/proc/stat cpu line:
    everything that is not idle/iowait, INCLUDING hypervisor steal —
    a stolen core slows us exactly like a foreign process, but the
    reject decision separates the two via box_steal_seconds because
    their remedies differ (see foreign_cpu_share)."""
    with open("/proc/stat") as fh:
        vals = [int(v) for v in fh.readline().split()[1:]]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
    return (sum(vals) - idle) / os.sysconf("SC_CLK_TCK")


def effective_cores(burn_s: float = 2.0) -> float:
    """Measured parallel capacity of the box RIGHT NOW: ncpus burner
    processes spin for ``burn_s`` and the user+sys CPU they actually
    accumulated, divided by wall, is the cores the hypervisor really
    delivers. On a host-capped VM the single-thread calibration probe
    reads normal while 32-thread phases get only ~24 cores (measured
    here: steal 24% at full load) — this probe makes that capacity
    drift visible cross-run the same way calib does for clock speed."""
    import multiprocessing as mp

    def _burn(stop_at: float) -> None:
        x = 1.0
        while time.time() < stop_at:
            x = x * 1.0000001 + 1e-9

    ncpus = os.cpu_count() or 1
    t0 = time.time()
    tree0 = tree_cpu_seconds()
    procs = [
        mp.Process(target=_burn, args=(t0 + burn_s,)) for _ in range(ncpus)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    wall = time.time() - t0
    used = tree_cpu_seconds() - tree0
    return round(used / wall, 2) if wall > 0 else float(ncpus)


def capacity_estimate(eff_pre: float, eff_post: float) -> float:
    """Effective capacity for the floor decision: the MAX of the pre-
    and post-run burner probes. A single 2 s probe can land in a
    hypervisor dip and misorder runs — the fastest r08 total on record
    (246.60 s) was floor-flagged at eff_cores 27.65 while slower runs
    measured 30+ (VERDICT r08 item 4). A dip must hit BOTH ends of an
    11-minute run to floor-flag it now; sustained host capping still
    does, which is the case the floor exists for."""
    return round(max(eff_pre, eff_post), 2)


def box_steal_seconds() -> float:
    """Hypervisor-steal CPU seconds since boot (/proc/stat field 8):
    time the host refused this VM's runnable vCPUs. On a host-capped
    box (measured here: ~24% of capacity stolen at full 32-thread
    load) steal dominates `busy - tree`, and no in-VM rerun can ever
    pass a threshold that counts it as foreign — so it is measured
    separately, REPORTED (summary + history), and excluded from the
    in-VM foreign-process reject decision. Steal slows the calibration
    probe identically, so the cross-run host-drift ratio remains the
    mechanism that normalizes steal-slowed totals across runs."""
    with open("/proc/stat") as fh:
        vals = [int(v) for v in fh.readline().split()[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return steal / os.sysconf("SC_CLK_TCK")


def tree_cpu_seconds() -> float:
    """CPU seconds consumed by THIS process tree: self + every live
    descendant (the py4j JVM outlives spark.stop(), and pyspark worker
    daemons are its children) + each member's reaped children
    (cutime/cstime), via /proc accounting."""
    hz = os.sysconf("SC_CLK_TCK")
    children: dict[int, list[int]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as fh:
                fields = fh.read().rsplit(")", 1)[1].split()
            children.setdefault(int(fields[1]), []).append(int(d))
        except (OSError, IndexError, ValueError):
            continue
    total = 0.0
    stack = [os.getpid()]
    seen = set()
    while stack:
        pid = stack.pop()
        if pid in seen:
            continue
        seen.add(pid)
        stack.extend(children.get(pid, []))
        try:
            with open(f"/proc/{pid}/stat") as fh:
                fields = fh.read().rsplit(")", 1)[1].split()
            total += sum(int(fields[i]) for i in (11, 12, 13, 14)) / hz
        except (OSError, IndexError, ValueError):
            continue
    return total


def foreign_cpu_share(
    busy_delta: float, tree_delta: float, wall: float, ncpus: int,
    steal_delta: float = 0.0,
) -> float:
    """Fraction of the BOX's capacity consumed by IN-VM processes
    outside this bench's tree during the run — the direct measurement
    of the r06 failure mode (a concurrent 32-core pytest read ~0.5; a
    quiet box reads < 0.03: harness + OS housekeeping). Hypervisor
    steal is subtracted: it is host throttling, not a foreign process,
    rerunning cannot avoid it (measured ~24% of this box at full
    load), and it is reported separately as steal_cpu_share so the
    number never hides. Pure function so the reject decision is
    unit-testable without an 11-minute run.

    This replaced two probe-relative designs: interleaved calibration
    probes CANNOT separate foreign load from the JVM's own state — on
    instrumented quiet-box runs the probes carried a systematic
    1.4-1.8x hot-heap tax over the pre-run value and their checkpoint
    medians legitimately spread up to 3x with residual heap pressure,
    so any probe threshold tight enough to catch 2x contamination also
    rejected clean runs (three false rejections on 2026-08-15). The
    probes remain recorded per checkpoint as drift diagnostics."""
    if wall <= 0 or ncpus <= 0:
        return 0.0
    return max(0.0, busy_delta - steal_delta - tree_delta) / (wall * ncpus)


def bench(sf_dir: str) -> tuple[
    dict[str, float], dict[str, list[float]], list[float], float,
    list[float], float,
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
    # The session-shared caches (near-dup pair graph, embedding-LSH
    # pairs, cluster labels) are keyed per (app, sf_dir): the sf0.001
    # warmup does not build them for the BENCH sf, so their one-time
    # materialization otherwise bills to whichever query touches them
    # first in pass 1 (observed: dedup_embedding 24.7 s cold vs 0.35 s
    # the moment the shared graph exists). Build them here, outside the
    # timed region — the timed numbers are then per-query marginal
    # costs, which is also what the min-of-3 estimator converges to.
    # r10: jaccard_est_error added — it builds the two calibration-side
    # shared frames (_ngram_pairs_t0_shared / _mh_pairs_shared) that
    # minhash_band_scurve also reads, per the same contract. The three
    # layout queries are warmed for the same reason: their one-time
    # per-(app, sf) bucketed/partitioned table writes are the ingest
    # side of the layout bargain (amortized in production; billed to
    # whichever sample ran first otherwise), while the timed samples
    # measure what those queries certify — the exchange-free query-time
    # path.
    # r11 (verdict item 2): the warm set is FROZEN — no additions without
    # a verdict sign-off — and the one-time costs it absorbs are now
    # MEASURED and REPORTED: warmup_sec (total) rides the stdout JSON and
    # the per-query breakdown lands in BENCH_DETAIL.json, so the
    # shared-frame builds and layout table writes never disappear from
    # the books (at 100 TB that build IS the dominant cost of those
    # paths).
    warmup_per_q: dict[str, float] = {}
    for warm_q in (
        "dedup_embedding", "dedup_clusters", "jaccard_est_error",
        "bucketed_join_revenue", "partition_pruned_revenue",
        "layout_composed_revenue",
    ):
        w0 = time.perf_counter()
        try:
            QUERIES[warm_q](spark, sf_dir).collect()
        except Exception:
            pass
        warmup_per_q[warm_q] = round(time.perf_counter() - w0, 4)
    calibration_probe(spark)  # warm the probe's codegen too

    bench_start = time.perf_counter()
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "420"))
    samples: dict[str, list[float]] = {}
    calib: list[float] = []
    mid_probes: list[float] = []

    # Pre-run probe: median of 3 — the reference speed of THIS box at
    # the moment the run starts (cross-run drift diagnostics only).
    pre = [round(calibration_probe(spark), 4) for _ in range(3)]
    pre_probe = statistics.median(pre)
    calib.extend(pre)

    # Parallel-capacity probe: how many cores the hypervisor actually
    # delivers at full load (the calib probe is single-threaded and
    # blind to host capping). Probed again after the timed region —
    # the floor decision takes the max (capacity_estimate).
    eff_pre = effective_cores()

    # Contamination accounting window opens here: everything the timed
    # region consumes is in THIS tree (python + JVM + worker daemons);
    # whatever else the box burns is foreign — except hypervisor steal,
    # measured separately (box_steal_seconds) and reported, not rejected.
    busy0, tree0, wall0 = box_busy_seconds(), tree_cpu_seconds(), time.time()
    steal0 = box_steal_seconds()

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
    # close the accounting window BEFORE spark.stop(): the JVM and its
    # worker daemons are still live and fully visible to the tree walk
    wall_delta = time.time() - wall0
    steal_delta = box_steal_seconds() - steal0
    ncpus = os.cpu_count() or 1
    share = foreign_cpu_share(
        box_busy_seconds() - busy0,
        tree_cpu_seconds() - tree0,
        wall_delta,
        ncpus,
        steal_delta=steal_delta,
    )
    steal_share = (
        steal_delta / (wall_delta * ncpus) if wall_delta > 0 else 0.0
    )
    # post-run capacity probe: outside the accounting window (closed
    # above), so its burners never count as foreign CPU
    eff_post = effective_cores()
    spark.stop()
    timings = {
        name: (-1.0 if s[0] < 0 else round(estimate(s), 4))
        for name, s in samples.items()
    }
    return (timings, samples, calib, pre_probe, mid_probes, share,
            steal_share, (eff_pre, eff_post), warmup_per_q)


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


TIMINGS_LOG = "BENCH_TIMINGS.jsonl"   # one JSON row per accepted run
CAPACITY_FLOOR = 29.0  # eff_cores below this ⇒ host-degraded row
STEAL_WARN = 0.30      # steal above this ⇒ prominent warning (ADVICE r07)
HISTORY_K = 5          # regression baseline: median of last k clean rows


def load_clean_history(
    k: int = HISTORY_K, sf: float | None = None
) -> list[dict]:
    """Last ``k`` accepted runs that were neither contaminated, nor
    host-degraded (eff_cores ≥ CAPACITY_FLOOR), nor heavy-steal
    (steal_cpu_share ≤ STEAL_WARN — a row BENCH_HISTORY.md labels
    HOST-DEGRADED must not enter the baseline it was declared unfit to
    be compared against; ADVICE r08) — the only rows a per-query time
    can fairly be compared against. With ``sf`` given, only rows at the
    SAME scale factor qualify: a sf0.01 smoke run's times in a sf0.1
    baseline would flag every query (r10 — the first mixed-sf log row
    surfaced this)."""
    rows: list[dict] = []
    try:
        with open(os.path.join(REPO, TIMINGS_LOG)) as f:
            for ln in f:
                try:
                    rows.append(json.loads(ln))
                except ValueError:
                    continue
    except OSError:
        return []
    clean = [
        r for r in rows
        if not r.get("contaminated")
        and isinstance(r.get("eff_cores"), (int, float))
        and r["eff_cores"] >= CAPACITY_FLOOR
        and not (
            isinstance(r.get("steal_cpu_share"), (int, float))
            and r["steal_cpu_share"] > STEAL_WARN
        )
        and (sf is None or r.get("sf") == sf)
    ]
    return clean[-k:]


def history_baseline(
    rows: list[dict],
) -> tuple[dict[str, float], float | None]:
    """(per-query median, median calib) over the clean history rows.
    The median over k runs is what makes single-run capacity artifacts
    stop masquerading as regressions (r07: four guard-passing runs of
    the SAME code each flagged a different query list when compared to
    one prior run)."""
    per_q: dict[str, list[float]] = {}
    for r in rows:
        for n, t in (r.get("queries") or {}).items():
            if isinstance(t, (int, float)) and t >= 0:
                per_q.setdefault(n, []).append(float(t))
    calibs = [
        float(r["calib_sec"])
        for r in rows
        if isinstance(r.get("calib_sec"), (int, float))
    ]
    return (
        {n: statistics.median(v) for n, v in per_q.items()},
        statistics.median(calibs) if calibs else None,
    )


def flag_regressions(
    timings: dict[str, float],
    baseline: dict[str, float],
    ratio: float | None,
) -> list[tuple[str, float, float]]:
    """Queries slower than baseline beyond host drift: t/base must beat
    both an absolute 1.3× and 1.15× the calib drift ratio. Pure
    function — unit-tested against a synthetic slow box (uniform 1.5×
    with matching calib ⇒ no flags) and a genuine single-query 3×
    regression (⇒ flagged)."""
    return sorted(
        (
            (n, t, baseline[n])
            for n, t in timings.items()
            if t > 0.5
            and isinstance(baseline.get(n), (int, float))
            and baseline[n] > 0
            and t / baseline[n] > max(1.3, (ratio or 1.0) * 1.15)
        ),
        key=lambda x: -(x[1] / x[2]),
    )[:8]


def split_regressions(
    regs: list[tuple[str, float, float]],
    prev_timings: dict,
    prev_ratio: float | None,
) -> tuple[list[tuple[str, float, float]], list[tuple[str, float, float]]]:
    """(confirmed, single-run outliers): a candidate flag must persist
    across two consecutive clean runs before it prints as a regression
    (r09 verdict item 4: one clean-code run printed six single-run
    flags — all sub-2 s bimodal jitter — while the runs on either side
    of it, on identical code, printed none). Confirmed = the previous
    clean run's time for the same query ALSO exceeded the threshold vs
    the same baseline; everything else is reported on a separate
    non-flag line and either confirms or evaporates next run."""
    confirmed, outliers = [], []
    for n, t, b in regs:
        p = prev_timings.get(n)
        if (
            isinstance(p, (int, float)) and p > 0.5 and b > 0
            and p / b > max(1.3, (prev_ratio or 1.0) * 1.15)
        ):
            confirmed.append((n, t, b))
        else:
            outliers.append((n, t, b))
    return confirmed, outliers


def append_timings_log(summary: dict, timings: dict[str, float]) -> None:
    row = {
        "stamp": datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%SZ"
        ),
        "sf": summary.get("sf"),
        "calib_sec": summary.get("calib_sec"),
        "eff_cores": summary.get("eff_cores"),
        "steal_cpu_share": summary.get("steal_cpu_share"),
        "contaminated": summary.get("contaminated", False),
        "queries": {n: t for n, t in timings.items()},
    }
    with open(os.path.join(REPO, TIMINGS_LOG), "a") as f:
        f.write(json.dumps(row, separators=(",", ":")) + "\n")


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
    steal = summary.get("steal_cpu_share")
    steal_txt = (
        f" steal={steal:.1%}" if isinstance(steal, float) and steal >= 0.01
        else ""
    )
    eff = summary.get("eff_cores")
    if isinstance(eff, (int, float)):
        steal_txt += f" eff_cores={eff}"
    lines.append(
        f"\n## {stamp} — sf={summary['sf']} total={summary['value']}s "
        f"n={summary['n_queries']} median={summary['median_sec']}s "
        f"calib={summary['calib_sec']}s spread={summary['calib_spread']}"
        f"{steal_txt}\n"
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
    # Degraded-capacity markers (r07 verdict item 4 + ADVICE): a row
    # recorded under heavy steal or low delivered cores is labelled so
    # downstream comparisons never mistake it for the round's number.
    steal_v = summary.get("steal_cpu_share")
    if isinstance(steal_v, float) and steal_v > STEAL_WARN:
        lines.append(
            f"HOST-DEGRADED: hypervisor steal {steal_v:.0%} exceeds "
            f"{STEAL_WARN:.0%} — totals are host-throttled; compare "
            "medians/calib-normalized only.\n"
        )
    eff_v = summary.get("eff_cores")
    if isinstance(eff_v, (int, float)) and eff_v < CAPACITY_FLOOR:
        lines.append(
            f"BELOW CAPACITY FLOOR: eff_cores {eff_v} < {CAPACITY_FLOOR} — "
            "this row does not stand as a round record.\n"
        )
    # Regression baseline: median of the last k clean history rows (the
    # r07 fix — one prior run's capacity artifacts flagged a different
    # query list on every same-code rerun); falls back to the previous
    # detail file until enough history accumulates.
    hist = load_clean_history(sf=summary.get("sf"))
    if len(hist) >= 2:
        base, base_calib = history_baseline(hist)
        base_ratio = (
            summary["calib_sec"] / base_calib
            if summary["calib_sec"] and base_calib
            else ratio
        )
        base_label = f"median of last {len(hist)} clean runs"
    else:
        base, base_ratio, base_label = prev_t, ratio, "previous run"
    base = {
        n: t for n, t in (base or {}).items()
        if isinstance(t, (int, float))
    }
    if base:
        regs = flag_regressions(timings, base, base_ratio)
        # persistence gate (r09 verdict item 4): compare against the
        # previous clean run so one run's capacity jitter cannot print
        # as a regression; with no clean history (prev-detail fallback)
        # there is no second run to consult — print candidates as-is
        if len(hist) >= 2:
            prev_row = hist[-1]
            prev_ratio = (
                prev_row["calib_sec"] / base_calib
                if isinstance(prev_row.get("calib_sec"), (int, float))
                and base_calib
                else base_ratio
            )
            confirmed, outliers = split_regressions(
                regs, prev_row.get("queries") or {}, prev_ratio
            )
        else:
            confirmed, outliers = regs, []
        eff_txt = (
            f" [eff_cores={eff_v}]"
            if isinstance(eff_v, (int, float))
            else ""
        )
        if confirmed:
            lines.append(
                f"Per-query regressions beyond drift (persisted 2 "
                f"consecutive runs, vs {base_label}){eff_txt}: "
                + ", ".join(
                    f"{n} {p:.2f}→{t:.2f}s" for n, t, p in confirmed
                )
                + "\n"
            )
        else:
            lines.append(
                f"Per-query regressions beyond drift (vs {base_label})"
                f"{eff_txt}: none\n"
            )
        if outliers:
            lines.append(
                "Single-run outliers (NOT flagged — a regression must "
                "persist 2 consecutive clean runs): "
                + ", ".join(
                    f"{n} {p:.2f}→{t:.2f}s" for n, t, p in outliers
                )
                + "\n"
            )
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
        res = bench(sf_dir)
        (timings, samples, calib, pre_probe, mid_probes, share,
         steal_share, eff_probes) = res[:8]
        # 9th element absent from older callers/stubs (same compat shim
        # as the eff_probes float fallback below)
        warmup_per_q = res[8] if len(res) > 8 else {}
    finally:
        sys.stdout.flush()
        os.dup2(saved_stdout, 1)
        sys.stdout = os.fdopen(saved_stdout, "w")

    # a float for backward compatibility (a stub or an old caller that
    # returns a single probe); the real bench() returns (pre, post)
    if isinstance(eff_probes, tuple):
        eff_pre, eff_post = eff_probes
        eff_cores = capacity_estimate(eff_pre, eff_post)
    else:
        eff_pre = eff_post = eff_cores = eff_probes
    contaminated = share > FOREIGN_SHARE_MAX
    forced = os.environ.get("SPARK_GRAFT_BENCH_FORCE") == "1"
    summary = summarize(timings, sf, calib)
    summary["pre_probe_sec"] = round(pre_probe, 3)
    summary["foreign_cpu_share"] = round(share, 4)
    summary["steal_cpu_share"] = round(steal_share, 4)
    summary["eff_cores"] = eff_cores
    summary["eff_cores_pre"] = eff_pre
    summary["eff_cores_post"] = eff_post
    summary["contaminated"] = contaminated
    # verdict r10 item 2: the untimed warmup absorbs real one-time work
    # (shared calibration frames, layout table writes) — surface it.
    # Total in the stdout JSON; per-query breakdown in the detail file.
    summary["warmup_sec"] = round(sum(warmup_per_q.values()), 2)
    with open(os.path.join(REPO, "BENCH_DETAIL.json"), "w") as f:
        json.dump(
            {
                **summary,
                "queries": timings,
                "samples": samples,
                "calib_samples": calib,
                "mid_probes": mid_probes,
                "families": family_totals(timings),
                "warmup_per_query": warmup_per_q,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    if contaminated and not forced:
        # Refuse the number: no stdout JSON ⇒ the driver has nothing to
        # record as BENCH_r*.json. The evidence stays in the detail file
        # and a rejected-run row in the history.
        with open(os.path.join(REPO, "BENCH_HISTORY.md"), "a") as f:
            f.write(
                f"\n## CONTAMINATED RUN REJECTED — foreign processes "
                f"consumed {share:.1%} of the box during the timed "
                f"region (threshold {FOREIGN_SHARE_MAX:.0%}); total "
                f"would have been {summary['value']}s over "
                f"{summary['n_queries']} queries. Re-run on a quiet "
                f"box.\n"
            )
        print(
            f"bench: CONTAMINATED — foreign processes consumed "
            f"{share:.1%} of the box's CPU during the timed region "
            f"(threshold {FOREIGN_SHARE_MAX:.0%}, measured from "
            "/proc/stat minus this process tree). Refusing to emit a "
            "summary line; re-run on a quiet box "
            "(SPARK_GRAFT_BENCH_FORCE=1 overrides).",
            file=sys.stderr,
        )
        sys.exit(3)
    if steal_share > STEAL_WARN:
        print(
            f"bench: WARNING — hypervisor steal consumed "
            f"{steal_share:.0%} of the box during the timed region "
            f"(> {STEAL_WARN:.0%}): totals are host-throttled, the "
            "history row is marked HOST-DEGRADED.",
            file=sys.stderr,
        )
    append_history(summary, timings, prev)
    append_timings_log(summary, timings)
    line = json.dumps(summary, separators=(",", ":"))
    # Belt and braces: the driver's round-1 capture held ~2000 chars.
    assert len(line) < 1900, f"bench summary line too long: {len(line)}"
    print(line)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
