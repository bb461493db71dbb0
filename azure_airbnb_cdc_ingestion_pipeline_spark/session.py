"""SparkSession factory.

Scale posture: AQE is always on (runtime re-plan, skew-join splitting,
partition coalescing); shuffle partitions default to the local core count
but should be sized ~2-3x total executor cores on a real cluster. The
reference ran its data flow on an 8-core managed Spark cluster
(/root/reference/pipeline/LoadBookingFact.json:29-32) with 4-8 partitions
per core guidance (/root/reference/README.md:571-574) — AQE subsumes that
hand-tuning.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """Half of physical RAM in whole GiB, clamped to [4g, 64g]; falls
    back to 8g when the host can't be probed (non-POSIX sysconf)."""
    try:
        total = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        gb = max(4, min(64, int(total / (2 * 1024**3))))
        return f"{gb}g"
    except (ValueError, OSError, AttributeError):
        return "8g"


def _default_max_result(driver_mem: str) -> str:
    """Default spark.driver.maxResultSize: min(4 GiB, driver heap / 2).

    The LSH broadcast-verify gate sizes its collect against this limit,
    so it must never EQUAL the heap (r8 advisor: a flat 4g limit inside
    a 4g heap on an 8 GiB host left no headroom for the collect plus its
    broadcast copy). r10 advisor: parse m/t suffixes too, and keep the
    never-equal invariant at tiny heaps (1g heap -> 512m limit, not 1g);
    an unparseable string falls back to 1g (safe under any heap >= 2g,
    and conservative rather than over-sized under smaller ones)."""
    s = str(driver_mem).strip().lower()
    try:
        if s.endswith("t"):
            mb = int(float(s[:-1]) * 1024 * 1024)
        elif s.endswith("m"):
            mb = int(float(s[:-1]))
        else:  # bare number or g/gb suffix = GiB
            mb = int(float(s.rstrip("gb")) * 1024)
    except ValueError:
        return "1g"
    half_mb = max(256, mb // 2)  # floor: Spark rejects 0; 256m min useful
    return f"{min(4096, half_mb)}m"


def get_spark(
    app_name: str = "airbnb-cdc-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Defaults honor the test-harness env: ``SPARK_GRAFT_CPUS`` sets the
    local master thread count (default 32 threads / local[*]).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    _driver_mem = os.environ.get(
        "SPARK_GRAFT_DRIVER_MEM", _default_driver_mem()
    )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Runtime adaptivity: coalesce post-shuffle partitions, convert
        # sort-merge→broadcast when the build side turns out small, split
        # skewed partitions. Core of the 100TB posture.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # r10 (guide §6.1): scan-split sizing is
        # min(maxPartitionBytes, max(openCostInBytes, bytes/parallelism))
        # — the stock 4 MB openCost FLOORS the split size, so a 10 MB
        # parquet file scans as ⌈10/4⌉ = 3 tasks regardless of core
        # count, serializing every scan-rooted map stage (measured:
        # graph_pagerank's pair-expansion stage ran 3-wide on 32 cores;
        # 256 KB → 31 splits, sf0.1 wall 5.53 → 4.77 s). The charge
        # models per-file OPEN cost, which for local/page-cached parquet
        # is far below 4 MB of scan work. Scale-adaptive by construction:
        # bytes/parallelism dominates once files outgrow cores·256 KB,
        # and at cluster scale (≥128 MB files) maxPartitionBytes governs
        # — production deployments can restore a bigger charge via
        # SPARK_GRAFT_OPEN_COST when listing thousands of tiny files.
        .config("spark.sql.files.openCostInBytes",
                os.environ.get("SPARK_GRAFT_OPEN_COST", "262144"))
        # Arrow for any pandas-UDF path (the only sanctioned Python hot path).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The reference ingests dates as strings and casts leniently
        # (typeConversion+allowDataTruncation,
        #  /root/reference/pipeline/LoadCustomerDim.json:94-101) — keep
        # ANSI off so casts are null-on-error like ADF, not exceptions.
        .config("spark.sql.ansi.enabled", "false")
        # The testdata events table carries INT64 TIMESTAMP(NANOS) parquet
        # timestamps, which Spark rejects by default — read them as long
        # nanos and convert at the reader (sources.readers.read_events).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # local-mode sizing: the driver JVM IS the executor — its heap is
        # shared by all 32 task slots, the block-manager cache, and every
        # sort/join buffer. 8g (the old default) is 250 MB/task and OOMed
        # the sf10 graph leg (r6); size to the HOST instead of a constant:
        # half of physical RAM, capped at 64g (the 128 GiB bench box gets
        # the old 64g; a 16 GiB laptop gets 8g and spills instead of the
        # kernel OOM-killing the JVM). On a real cluster this knob is
        # per-executor and set by the deployment, not here.
        .config("spark.driver.memory", _driver_mem)
        # r8: the LSH broadcast-verify path materializes the unit matrix
        # via one bounded driver collect (≤ SPARK_GRAFT_LSH_BCAST_MB,
        # default 2 GiB) — the stock 1g maxResultSize rejects it at
        # ~2M vectors. min(4g, driver_mem/2) covers the gate with
        # headroom while never letting the limit EQUAL the heap on
        # small hosts (r8 advisor: a 4g limit inside a 4g heap admits a
        # ~2 GiB collect + broadcast copy with no headroom); the
        # dispatch in cosine_pairs_lsh ALSO reads the session's
        # effective limit, so a tight session degrades to the inline
        # plan instead of crashing.
        .config("spark.driver.maxResultSize",
                os.environ.get("SPARK_GRAFT_MAX_RESULT",
                               _default_max_result(_driver_mem)))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


# ---------------------------------------------------------------------------
# persisted-frame registry
# ---------------------------------------------------------------------------
# Operators that persist intermediate frames (minhash signatures, normalized
# embeddings) register them here so long-lived sessions (bench loops, test
# suites, notebooks) can release executor storage between queries instead of
# accumulating blocks for the session's lifetime.

_PERSISTED: list = []


def track_persist(df, storage_level=None):
    """persist() a DataFrame and register it for later bulk release."""
    df.persist() if storage_level is None else df.persist(storage_level)
    _PERSISTED.append(df)
    return df


def release_persisted(blocking: bool = False) -> int:
    """Unpersist every tracked frame; returns how many were freed.
    Safe to call at any time — consuming plans already executed hold their
    results, and a re-run simply recomputes. ``blocking=True`` waits for
    the block removal — benchmark loops use it so one query's eviction
    work can't bleed into the NEXT query's measured wall (r9)."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n


#: memo for fan_out's partition probe — the ``df.rdd`` conversion is
#: analysis-only (no job) but rebuilds the RDD-side plan each call; a hot
#: loop re-probing the same frame pays it repeatedly (VERDICT r3 watch-item
#: b). Weak keys: entries die with their DataFrame, and a re-created frame
#: is a new key, so the memo can never serve a stale count.
_fanout_probe_cache: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def fan_out(df, min_factor: int = 2, rows: int | None = None,
            rows_per_task: int = 40_000):
    """Spread a compute-heavy frame across the session's parallelism when
    the scan yielded too few partitions (tiny file / single parquet row
    group) — otherwise a per-row kernel (shingle hashing, minhash folds,
    cosine arithmetic) serializes on one or two cores. No-op when the
    input already has enough partitions, which is the 100 TB case: real
    tables scan as many splits, so this guards exactly the small-input
    edge where the shuffle it introduces is by construction cheap.

    ``rows`` (r10, verdict task #8): callers that DERIVE and persist a
    much-wider column per row (shingle-hash arrays are ~10× the scanned
    text bytes) pass the row count, and the target scales to
    rows/rows_per_task — sizing the cached partitions to the DERIVED
    width, not the scan width. At sf100 the minhash family's 32
    scan-sized cache partitions carried ~92 MB tasks; 40 k rows/task
    keeps every cached partition (~800 B/row of shingles) near 32 MB."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if rows is not None:
        target = max(target, -(-rows // rows_per_task))
    n = _fanout_probe_cache.get(df)
    if n is None:
        n = df.rdd.getNumPartitions()
        try:
            _fanout_probe_cache[df] = n
        except TypeError:  # unhashable/no-weakref frame — just skip memo
            pass
    # r5: `n < target`, not `n * 2 <= target`. Size-based parquet splits
    # can exceed the row-group count, leaving most splits EMPTY (sf10
    # docs: 5 row groups → 28 splits, 5 non-empty → the CPU-bound
    # simhash build ran ~5-way on 32 cores, 21.6× for 10× docs). Any
    # split count below the session parallelism is worth one cheap
    # redistribution for the kernels this guards; at real scale scans
    # have ≥ target splits and this stays a no-op.
    if n < target:
        return df.repartition(target)
    return df
