"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced to full materialization with the noop sink (no
driver-side collect, all columns computed) — measures the executor-side
plan, not toPandas serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Pin BLAS pools to one thread per worker BEFORE numpy loads anywhere
# (local[32] forks 32 Python workers; letting each spawn its own BLAS
# threads oversubscribes the box — measured 3-5x inflation on the
# GEMM-backed ANN queries under host CPU steal). Workers inherit the
# driver env, so setting it here covers mapInPandas kernels too.
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from azure_airbnb_cdc_ingestion_pipeline_spark.plans.queries import QUERIES
from azure_airbnb_cdc_ingestion_pipeline_spark.session import get_spark

HEADLINE = [
    # reference-parity relational core
    "agg_groupby_join",
    "join_inner_equi",
    "derive_columns",
    "topk_per_group",
    "lookup_join_latest",
    "sink_upsert_merge",
    "scd1_upsert",
    "filter_split_good",
    # charter extensions: windows / dedup / similarity / text
    "window_ranking",
    "window_session",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality_score",
    # relational depth: TPC-H-style wide agg + top-N join
    "sql_pricing_summary",
    "sql_top_revenue_orders",
    # scale extensions added r2: Arrow GEMM ANN, LSH-blocked embedding
    # near-dup, portable simhash, packing, profiling, redaction
    "ann_numpy_topk",
    "embedding_cosine_pairs",
    "dedup_simhash",
    "sequence_pack_chunks",
    "profile_columns",
    "text_pii_redact",
    # LLM-pipeline hygiene + event analytics added late r2
    "corpus_decontaminate",
    "sessionize_events",
    "cdc_apply_changes",
    # retrieval + recursive-fold families added r2
    "text_bm25_rank",
    "events_ewma",
    # r3 additions: boilerplate span detection, semantic dedup, mixture
    # weighting, vocab coverage, SQL passthrough
    "text_boilerplate_ratio",
    "semdedup_cells",
    "domain_mixture_weights",
    "text_oov_rate",
    "sql_passthrough_revenue",
    # r4 additions: full-TPC-H completion (scan-bound Q6, join-heavy Q8),
    # incremental dedup vs signature store, cross-corpus embedding
    # decontamination, hashed-classifier scoring, shard manifest
    "sql_forecast_revenue",
    "sql_market_share",
    "dedup_incremental_minhash",
    "embedding_decontaminate",
    "text_hash_classifier",
    "corpus_shard_manifest",
    "corpus_budget_select",
    "text_bigram_nll",
    # r5 additions: hybrid-retrieval fusion, contrastive hard-negative
    # mining, exact-substring span dedup
    "retrieval_hybrid_rrf",
    "ann_hard_negatives",
    "dedup_substring_spans",
    "sketch_kmv_distinct",
    "sketch_countmin_freq",
    "table_zorder_layout",
    "embedding_random_projection",
    "graph_pagerank",
    "sketch_kmv_setops",
    "sketch_kmv_quantiles",
    "sample_weighted_reservoir",
    "audio_spectral_features",
    "events_time_weighted_avg",
    "events_pivot_by_type",
    "grouping_cube",
    "dq_expectations",
    "ann_pq_recall",
    # r6 additions: distributed-query-side ANN, sampled triangle
    # estimation, product-analytics family (sequential funnel, cohort
    # retention, RFM via distributed exact ntile, Markov transitions)
    "ann_blocked_topk",
    "graph_triangle_doulion",
    "funnel_sequential",
    "cohort_retention",
    "rfm_segments",
    "event_transitions",
    "exact_median_rank",
    "funnel_windowed",
    "event_top_paths",
    "scd2_history",
    "table_reconcile",
    "table_time_travel",
    # r7: perceptual image dedup + tokenizer-true BPE
    "multimodal_phash_dedup",
    "text_bpe_encode",
    "sequence_pack_bpe",
    # r8: real-world JPEG profiles (4:2:0/4:2:2) reach the image path
    "multimodal_jpeg420_roundtrip",
    "multimodal_phash_dedup_mixed",
    # r10: web-corpus front door — WARC/WET ingestion + HTML extraction
    "source_warc_read",
    "text_html_extract",
    # r10: model-based quality filtering
    "text_nb_classifier",
    # r11 (VERDICT r10 task #2): forced-DISTRIBUTED twins of the five
    # r10 driver-dispatch kernels — same queries, driver gate forced
    # off, so the distributed paths (the 100 TB plans) stay under the
    # round's regression gate instead of being invisible at bench SF.
    "graph_pagerank_dist",
    "graph_triangle_doulion_dist",
    "exact_median_rank_dist",
    "rfm_segments_dist",
    "dedup_cluster_canonical_dist",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("engine-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + file listing once (excluded from per-query timing)
    QUERIES["agg_groupby_join"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    from azure_airbnb_cdc_ingestion_pipeline_spark.session import release_persisted

    timings: dict[str, float] = {}
    io_stats: dict[str, dict] = {}
    names = [n for n in HEADLINE if n in QUERIES]
    only = [n for n in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if n]
    if only:  # family-focused scale runs (e.g. sf10 dedup validation)
        names = [n for n in names if n in only]
    extra = [n for n in os.environ.get("SPARK_GRAFT_BENCH_EXTRA", "").split(",") if n]
    # k samples per query (k=3 default since r11): the shared host shows
    # 20%+ CPU steal and per-query run-to-run swings of 2-10x. The
    # RECORDED per-query number is the MEDIAN of the samples (VERDICT
    # r10 task #8 — min-of-2 rewarded lucky draws and the driver's
    # round-over-round comparisons chased them); the per-query
    # regression GATE still compares the min, because every prior-round
    # record is min-based and a median-vs-min comparison would
    # manufacture regressions out of pure methodology. Raw samples ride
    # in BENCH_DIAG. A wall budget caps the extra passes so the
    # driver's capture window is never at risk.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "420"))
    calib0 = _calibrate()
    steal0 = _steal_ticks()
    suite_t0 = time.perf_counter()

    def _run_once(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        # Between-query hygiene (r9), all OUTSIDE the timers: blocking
        # unpersist + one forced JVM GC — the JMH pattern. Measured: a
        # query after 8 heavy predecessors read 7.8s vs 5.9s after a
        # GC on the same session; without this, each wall charges the
        # query for its predecessors' garbage, and the per-query
        # regression gate compares heap-state noise, not code.
        release_persisted(blocking=True)
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        return dt

    samples: dict[str, list[float]] = {}
    cum = _cumulative_stage_bytes(spark)
    for name in names + extra:
        timings[name] = _run_once(name)
        samples[name] = [timings[name]]
        if cum is not None:
            nxt = _cumulative_stage_bytes(spark)
            if nxt is not None:
                io_stats[name] = {
                    k: round((nxt[k] - cum[k]) / 1e6, 2) for k in nxt
                }
                cum = nxt
    for _ in range(repeats - 1):
        for name in names + extra:
            if time.perf_counter() - suite_t0 > budget:
                break
            w = _run_once(name)
            samples[name].append(w)
            timings[name] = min(timings[name], w)

    calib1 = _calibrate()
    steal1 = _steal_ticks()

    def _median(vals: list[float]) -> float:
        # lower-middle: median for odd n, the LOWER of the two middles
        # for even n (budget-truncated repeats) — never the max of 2
        return sorted(vals)[(len(vals) - 1) // 2]

    total = round(sum(timings.values()), 3)
    calib = min(calib0, calib1)
    # Calibrated units (r4 verdict task #7): scale every wall by
    # (REF_CALIB / host_calib_sec) — the fixed yardstick loop's speed
    # ratio vs the r4 reference host — so cross-round deltas compare
    # engine changes, not VM weather. calibrated_sec = sec * REF/calib.
    # Formula documented in README.md §Benchmarking.
    cal = (_REF_CALIB / calib) if calib > 0 else 1.0
    out = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # Host-noise context for cross-round comparability: a fixed
        # single-thread Python loop (seconds; bigger = slower host) and
        # the VM's CPU-steal fraction over the suite window. Round-over-
        # round wall deltas should be read against these.
        "host_calib_sec": calib,
        "host_steal_pct": _steal_pct(steal0, steal1),
        "host_calib_ref": _REF_CALIB,
        "value_calibrated": round(total * cal, 3),
    }
    # Diagnostics go to stderr + a sidecar file, NOT the stdout metric
    # line: the driver tail-captures ~2000 chars of stdout and must always
    # see the final JSON line intact (BENCH_r02 lost its record when io_mb
    # pushed the line past the window).
    diag: dict[str, object] = {}
    prev, prev_calib, prev_skipped = _previous_round(out["sf"])
    if prev_skipped:
        # a NEWER round's record exists but could not be parsed — the
        # comparison below is rebased onto an older round. Loud in the
        # record (and fatal under STRICT, after the metric line prints).
        out["prev_round_skipped"] = prev_skipped
        print(
            f"WARNING: BENCH_r{prev_skipped} record(s) unparseable — "
            "round-over-round comparison rebased onto an older round",
            file=sys.stderr,
        )
    if prev:
        # round-over-round regression visibility: per-query delta vs the
        # previous round's recorded bench (same sf only)
        diag["delta_vs_prev"] = {
            n: round(t - prev[n], 3) for n, t in timings.items() if n in prev
        }
        if prev_calib:
            # calibrated delta: both rounds rescaled to the reference
            # host before differencing, so a slow-VM round doesn't read
            # as a code regression
            pcal = _REF_CALIB / prev_calib
            diag["delta_vs_prev_calibrated"] = {
                n: round(t * cal - prev[n] * pcal, 3)
                for n, t in timings.items()
                if n in prev
            }
        # apples-to-apples wall: the suite grows every round, so also emit
        # this run's total over ONLY the queries the previous round timed
        out["prev_subset_wall"] = round(
            sum(t for n, t in timings.items() if n in prev), 3
        )
        out["prev_wall"] = round(sum(prev.values()), 3)
        if prev_calib:
            out["prev_subset_wall_calibrated"] = round(
                sum(t * cal for n, t in timings.items() if n in prev), 3
            )
            out["prev_wall_calibrated"] = round(
                sum(v * (_REF_CALIB / prev_calib) for v in prev.values()), 3
            )
    # Per-query regression gate (VERDICT r5 #9): flag any query whose
    # CALIBRATED wall exceeds REG_RATIO x its prior-round calibrated
    # value AND regresses by more than REG_FLOOR_SEC absolute (the floor
    # keeps 0.1s->0.2s host jitter out of the gate). The flags ride in
    # the metric line every run; SPARK_GRAFT_BENCH_STRICT=1 (the round
    # wrap / pre-commit setting, see BASELINE.md §Benchmarking) turns
    # them into a non-zero exit so a regression fails at commit time,
    # not at judging.
    regressions: list[dict] = []
    rebased: list[dict] = []
    if prev and prev_calib:
        pcal = _REF_CALIB / prev_calib

        def _regresses(t: float, was: float) -> bool:
            now_c, was_c = t * cal, was * pcal
            return now_c > was_c * _REG_RATIO and now_c - was_c > _REG_FLOOR_SEC

        # Variance-robust confirmation (VERDICT r9 task #1): the r9
        # driver run flagged 3 regressions the builder's same-day runs
        # did not reproduce — best-of-2 is not noise-proof when a host
        # contention burst spans both repeats. Any would-be regression
        # is RE-MEASURED with up to 3 additional fresh walls (same GC
        # hygiene, own budget so main-budget exhaustion can't skip it)
        # and only flagged if the MEDIAN of the fresh walls still
        # regresses. A real code regression has a high median; a
        # contention burst does not survive three spaced re-runs.
        recheck_t0 = time.perf_counter()
        recheck_budget = float(
            os.environ.get("SPARK_GRAFT_BENCH_RECHECK_BUDGET", "120")
        )
        for n in list(timings):
            if n not in prev or not _regresses(timings[n], prev[n]):
                continue
            fresh: list[float] = []
            for _ in range(3):
                if time.perf_counter() - recheck_t0 > recheck_budget:
                    break
                w = _run_once(n)
                fresh.append(w)
                samples[n].append(w)
                timings[n] = min(timings[n], w)
            if fresh:
                med = sorted(fresh)[len(fresh) // 2]
                if not _regresses(med, prev[n]):
                    continue  # noise, cleared by the median re-measure
            now_c, was_c = timings[n] * cal, prev[n] * pcal
            if not _regresses(timings[n], prev[n]):
                continue
            if n in _REBASED:
                rebased.append(
                    {
                        "query": n,
                        "now": round(now_c, 3),
                        "prev": round(was_c, 3),
                        "reason": _REBASED[n],
                    }
                )
            else:
                regressions.append(
                    {"query": n, "now": round(now_c, 3), "prev": round(was_c, 3)}
                )
        total = round(sum(timings.values()), 3)
        out["value"] = total
        out["value_calibrated"] = round(total * cal, 3)
        if "prev_subset_wall" in out:
            out["prev_subset_wall"] = round(
                sum(t for n, t in timings.items() if n in prev), 3
            )
            if prev_calib:
                out["prev_subset_wall_calibrated"] = round(
                    sum(t * cal for n, t in timings.items() if n in prev), 3
                )
    # Recorded numbers = per-query MEDIANS (r11, VERDICT r10 task #8).
    # The min-based walls the gate used stay in BENCH_DIAG as
    # queries_min/value_min so the old methodology's numbers remain
    # comparable across the transition round.
    medians = {n: round(_median(samples[n]), 3) for n in timings}
    out["queries"] = medians
    out["value"] = round(sum(medians.values()), 3)
    out["value_calibrated"] = round(out["value"] * cal, 3)
    out["stat"] = "median"
    out["samples"] = repeats
    diag["queries_min"] = dict(timings)
    diag["value_min"] = round(sum(timings.values()), 3)
    if prev:
        out["prev_subset_wall"] = round(
            sum(t for n, t in medians.items() if n in prev), 3
        )
        if prev_calib:
            out["prev_subset_wall_calibrated"] = round(
                sum(t * cal for n, t in medians.items() if n in prev), 3
            )
    if regressions:
        out["regressions"] = regressions
    if rebased:
        out["rebased"] = rebased
    if prev:
        # recompute after the recheck loop may have lowered timings
        diag["delta_vs_prev"] = {
            n: round(t - prev[n], 3) for n, t in timings.items() if n in prev
        }
        if prev_calib:
            pcal = _REF_CALIB / prev_calib
            diag["delta_vs_prev_calibrated"] = {
                n: round(t * cal - prev[n] * pcal, 3)
                for n, t in timings.items()
                if n in prev
            }
    # Per-query variance evidence (VERDICT r9 task #1): every observed
    # wall for every query, in run order — first entry is the cold pass,
    # later entries are best-of-k repeats and any regression re-measures.
    # Spread across samples is the host-noise context a flagged (or
    # unflagged) delta should be read against.
    diag["samples"] = samples
    diag["spread_pct"] = {
        n: round(100.0 * (max(v) - min(v)) / max(min(v), 1e-9), 1)
        for n, v in samples.items()
        if len(v) > 1
    }
    if io_stats:
        # per-query shuffle/scan volume (MB) from the status API — the
        # "is there a shuffle that shouldn't be here" signal at a glance
        diag["io_mb"] = io_stats
    if diag:
        print(json.dumps(diag), file=sys.stderr)
        # BENCH_ONLY subset probes must not clobber the full-suite
        # diagnostic — it is the strict gate's prior-wall reference
        if not os.environ.get("SPARK_GRAFT_BENCH_ONLY"):
            try:
                here = os.path.dirname(os.path.abspath(__file__))
                with open(os.path.join(here, "BENCH_DIAG.json"), "w") as f:
                    json.dump({**out, **diag}, f, indent=1)
            except OSError:
                pass
    print(json.dumps(out))
    if regressions and os.environ.get("SPARK_GRAFT_BENCH_STRICT"):
        print(
            f"REGRESSION GATE: {len(regressions)} quer{'y' if len(regressions)==1 else 'ies'} "
            f"over {_REG_RATIO}x calibrated prior: "
            + ", ".join(
                f"{r['query']} {r['prev']}->{r['now']}s" for r in regressions
            ),
            file=sys.stderr,
        )
        sys.exit(3)
    if prev_skipped and os.environ.get("SPARK_GRAFT_BENCH_STRICT"):
        print(
            f"STRICT GATE: newer round record(s) r{prev_skipped} "
            "unparseable — fix or remove before trusting comparisons",
            file=sys.stderr,
        )
        sys.exit(4)


def _calibrate() -> float:
    """Fixed single-thread work unit — a host-speed yardstick that rides
    along in the metric line so a slow/contended VM is visible in the
    record instead of masquerading as a code regression."""
    t0 = time.perf_counter()
    x = 0
    for i in range(5_000_000):
        x += i
    return round(time.perf_counter() - t0, 3)


def _steal_ticks() -> tuple[int, int] | None:
    """(steal, total) jiffies from /proc/stat (None off-Linux)."""
    try:
        with open("/proc/stat") as f:
            vals = [int(v) for v in f.readline().split()[1:]]
        return vals[7], sum(vals)
    except (OSError, IndexError, ValueError):
        return None


def _steal_pct(a, b) -> float | None:
    if a is None or b is None or b[1] <= a[1]:
        return None
    return round(100.0 * (b[0] - a[0]) / (b[1] - a[1]), 1)


def _cumulative_stage_bytes(spark) -> dict[str, float] | None:
    """Cumulative shuffle-read/write and scan input bytes across all
    completed stages, from the Spark UI REST API (None if the UI is
    off). Successive deltas give per-query I/O volume."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return None
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=5
        ) as r:
            stages = json.load(r)
    except Exception:
        return None
    out = {"shuffle_read": 0.0, "shuffle_write": 0.0, "input": 0.0}
    for s in stages:
        out["shuffle_read"] += s.get("shuffleReadBytes", 0)
        out["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        out["input"] += s.get("inputBytes", 0)
    return out


#: host-calibration reference: the r4 bench host's yardstick-loop time
#: (BENCH_r04 host_calib_sec). calibrated_sec = sec * _REF_CALIB / calib.
_REF_CALIB = 0.162

#: regression gate thresholds: a query regresses when its calibrated
#: wall is > ratio x the prior round's AND the excess tops the absolute
#: floor (sub-floor swings are host noise at best-of-2 sampling).
_REG_RATIO = 1.5
_REG_FLOOR_SEC = 0.3

#: Deliberate re-baselines: queries whose SEMANTICS changed this round,
#: so the prior-round wall is not a like-for-like baseline. The gate
#: skips them but records each under out["rebased"] with its reason —
#: visible in the artifact, never a silent exemption. Entries are
#: removed the round after they land (the new wall becomes the
#: baseline).
_REBASED: dict[str, str] = {}  # r11: r10's mixed-corpus entry landed in
#  BENCH_r10 (the new corpus IS the baseline now) and is removed per the
#  one-round contract above.


def _previous_round(
    sf,
) -> tuple[dict[str, float] | None, float | None, list[int]]:
    """(per-query timings, host_calib_sec, skipped_rounds) from the
    newest BENCH_r*.json at the same sf (calib None when that round
    predates the field). ``skipped_rounds`` lists round numbers NEWER
    than the one used whose record could not be parsed (r11, VERDICT
    r10 task #2: BENCH_r09's truncated record silently rebased every
    comparison onto r8 — a skip must be loud, and fatal under STRICT)."""
    import glob
    import re

    best: tuple[int, dict, float | None] | None = None
    unusable: list[int] = []
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        n = int(m.group(1))
        try:
            with open(path) as f:
                parsed = json.load(f).get("parsed") or {}
        except (OSError, json.JSONDecodeError):
            unusable.append(n)
            continue
        if parsed.get("sf") == sf and parsed.get("queries"):
            if best is None or n > best[0]:
                best = (n, parsed["queries"], parsed.get("host_calib_sec"))
        else:
            unusable.append(n)
    if best is None:
        return (None, None, [])  # nothing to compare against at this sf
    skipped = sorted(n for n in unusable if n > best[0])
    return (best[1], best[2], skipped)


if __name__ == "__main__":
    main()
