"""LoadBookingFact — the CDC transform + gold refresh (speed layer).

Reference entry point 3 (SURVEY §3.3): change feed → data flow
(split → derive → lookup/alter-row → select → keyed upsert sink)
→ stored-proc gold rebuild.
- data flow:   /root/reference/dataflow/BookingDataTransformation.json:54-187
- orchestration: /root/reference/pipeline/LoadBookingFact.json
- gold proc:   /root/reference/synapse_table_creation.sql:71-88

The lookup-join + alter-row(insert/update) + upsert-sink chain collapses
into the keyed MERGE (operators.merge): whenMatchedUpdateAll ≡
updateIf(not(isNull(lookup.key))), whenNotMatchedInsertAll ≡
insertIf(isNull(lookup.key)) — same logical plan, one operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregate import gold_booking_aggregation
from ..operators.derive import derive_booking_columns
from ..operators.split import conditional_split
from ..schemas import BOOKING_DOC_SCHEMA
from ..sources.tables import ParquetTable
from ..streaming.cdc import read_change_feed, run_foreach_batch_merge

def _quality_pred():
    # The reference compares the STRING dates lexicographically
    # (dataflow/…:96 — correct for ISO yyyy-MM-dd); keep that exact predicate.
    return F.col("check_out_date") < F.col("check_in_date")


FACT_KEYS = ["booking_id"]
FACT_ORDER = ["timestamp"]


def transform_bookings(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """split(quality gate) → derive: returns (fact_rows, rejected_rows).
    Predicate-true rows (impossible bookings) route to the FIRST stream."""
    bad, good = conditional_split(raw, _quality_pred())
    return derive_booking_columns(good), bad


# Fact partitioning for the pruned merge: a booking's calendar month is
# immutable across updates (the upsert_pruned precondition), and CDC
# updates cluster in recent months — steady-state batches rewrite only
# the hot partitions.
FACT_PARTITIONING = ["booking_year", "booking_month"]


#: Default publish-gate suite for the booking fact (post-derive schema):
#: the contracts a breach of which means the MERGE must not run — the
#: micro-batch generalization of the reference's stopOnFirstError
#: (dataflow/BookingDataTransformation.json:185). Predicates are
#: VIOLATION conditions (true = row breaks the contract).
def booking_expectations() -> list:
    return [
        ("booking_id_not_null", F.col("booking_id").isNull()),
        ("amount_non_negative", F.col("amount") < 0),
        ("stay_duration_valid", F.col("stay_duration") < 0),
        ("event_time_present", F.col("timestamp").isNull()),
    ]


def process_booking_batch(
    batch: DataFrame,
    fact: ParquetTable,
    quarantine: ParquetTable,
    dim: DataFrame | None = None,
    gold: ParquetTable | None = None,
    partitioned: bool = True,
    incremental_gold: bool = False,
    event_time_wins: bool = False,
    app_id: str | None = None,
    batch_id: int | None = None,
    merge_on_read: bool = False,
    dq_rules: list | None = None,
    dq_on_breach: str = "halt",
    dq_quarantine: ParquetTable | None = None,
) -> None:
    """One micro-batch: quarantine bad rows, MERGE good rows into the fact
    (latest-per-booking_id wins), then refresh gold if a dim is wired.

    ``merge_on_read=True`` (the streaming entry's default): the fact
    merge defers to `ParquetTable.upsert_delta` — O(batch) delta append
    per trigger with periodic folds — instead of the copy-on-write
    pruned merge whose rewrite floor dominates small micro-batches (the
    r4 steady-state throughput miss). Readers always see resolved
    content either way.

    ``app_id``+``batch_id`` (set by the streaming entry) arm the
    per-table idempotent batch guard: each sink commit atomically records
    (app_id, batch_id) in its pointer (ParquetTable txn markers), and a
    REPLAYED batch — foreachBatch died after some sinks committed but
    before the checkpoint commit — skips every sink that already recorded
    this batch. Without the guard the keyed MERGE is naturally idempotent
    but the quarantine APPEND is not (a replay would duplicate rejected
    rows), and the incremental-gold delta would be computed from an
    already-merged before-image.

    `event_time_wins=True` switches the merge's matched-row conflict rule
    from arrival order (the reference's alter-row behavior) to max event
    `timestamp`: out-of-order micro-batches then converge to the same
    fact state regardless of delivery order.

    `partitioned=True` uses the partition-pruned merge (only the months
    present in the batch are rewritten; the rest of the fact table is
    hardlinked forward — the 100 TB steady state).

    `incremental_gold=True` maintains gold with retraction deltas
    (operators.aggregate.merge_gold/signed_delta): O(batch + |groups|)
    per trigger instead of re-aggregating the whole fact — the matching
    steady state for the pruned merge. Falls back to a full refresh on
    the first batch (no standing gold yet)."""
    # Materialize the micro-batch once: every consumer below (quarantine
    # emptiness probe + append, merge, partition-combo collect, gold
    # before-image) otherwise re-parses the landing JSON — at 4 consumers
    # that's 4x the scan cost per trigger. A micro-batch fits in memory
    # by construction (it's trigger-bounded).
    if dq_rules is not None and dq_on_breach == "quarantine" and dq_quarantine is None:
        # Wiring error, not a data error: fail before ANY batch runs
        # rather than killing the stream mid-run at the first breach.
        raise ValueError(
            "dq_on_breach='quarantine' requires a dq_quarantine table — "
            "breaching rows must not be dropped silently"
        )
    batch = batch.persist()
    dq_cached: DataFrame | None = None
    try:
        derived, rejected = transform_bookings(batch)
        if dq_rules is not None:
            # Expectation gate BEFORE any sink commit (VERDICT r5 #7):
            # halt mode raises here — neither quarantine append, fact
            # merge, nor gold refresh runs, and the checkpoint never
            # commits the batch, so a fixed-and-restarted stream replays
            # it cleanly. Quarantine mode diverts breaching rows to a
            # DEDICATED table (derived schema ≠ the raw rejected-rows
            # schema) and publishes the clean remainder.
            from ..operators.dq import expectation_gate

            dq_cached = derived.persist()
            derived, breached = expectation_gate(
                dq_cached, dq_rules, on_breach=dq_on_breach
            )
            if breached is not None:
                if dq_quarantine is None:
                    raise ValueError(
                        "dq_on_breach='quarantine' requires a dq_quarantine "
                        "table — breaching rows must not be dropped silently"
                    )
                if not _already_applied(dq_quarantine, app_id, batch_id):
                    txn = (
                        (app_id, batch_id)
                        if app_id is not None and batch_id is not None
                        else None
                    )
                    dq_quarantine.append(breached, txn=txn)
                    dq_quarantine.maybe_compact(trigger_files=64)
        _process_transformed(
            derived, rejected, fact, quarantine, dim, gold,
            partitioned, incremental_gold, event_time_wins,
            app_id=app_id, batch_id=batch_id, merge_on_read=merge_on_read,
        )
    finally:
        if dq_cached is not None:
            dq_cached.unpersist()
        batch.unpersist()


def _already_applied(table: ParquetTable, app_id, batch_id) -> bool:
    """True when ``table`` has already committed this (app, batch) — the
    replay-detection half of the idempotent batch guard."""
    if app_id is None or batch_id is None or not table.exists():
        return False
    last = table.last_txn(app_id)
    return last is not None and last >= batch_id


def _process_transformed(
    derived: DataFrame,
    rejected: DataFrame,
    fact: ParquetTable,
    quarantine: ParquetTable,
    dim: DataFrame | None,
    gold: ParquetTable | None,
    partitioned: bool,
    incremental_gold: bool,
    event_time_wins: bool = False,
    app_id: str | None = None,
    batch_id: int | None = None,
    merge_on_read: bool = False,
) -> None:
    from ..operators.merge import latest_per_key

    txn = (app_id, batch_id) if app_id is not None and batch_id is not None \
        else None
    if not rejected.isEmpty():
        if not _already_applied(quarantine, app_id, batch_id):
            # O(batch) append, NOT idempotent on its own — the txn marker
            # (committed atomically with the append) is what makes a
            # replayed batch skip it instead of duplicating rejected rows
            quarantine.append(rejected, txn=txn)
            # append-per-batch accumulates one file per trigger forever;
            # the size-triggered compaction keeps the live file count
            # saw-toothing below the trigger instead (steady-state bound)
            quarantine.maybe_compact(trigger_files=64)
    fact_replayed = _already_applied(fact, app_id, batch_id)
    maintain_incrementally = (
        incremental_gold and dim is not None and gold is not None and gold.exists()
    )
    if maintain_incrementally:
        # before-image: current fact rows for the batch's keys, snapshotted
        # against the pre-merge table version (version dirs are immutable,
        # and _vacuum(keep=2) retains it across the one merge commit that
        # lands before this plan materializes in gold.overwrite below).
        # On a REPLAY whose fact merge already committed, "current" would
        # be the post-merge state (delta ≈ 0 → gold stuck stale), so read
        # the pre-merge snapshot the txn marker recorded instead.
        batch_latest = latest_per_key(derived, FACT_KEYS, FACT_ORDER)
        if fact_replayed:
            from ..sources.tables import read_version

            fact_now = fact.read()
            base_v = fact.last_txn_base(app_id)
            if base_v:
                fact_now = read_version(fact, base_v)
            before = fact_now.join(
                F.broadcast(batch_latest.select(*FACT_KEYS).distinct()),
                on=FACT_KEYS,
                how="left_semi",
            )
        else:
            # key-restricted resolved read: under merge-on-read a plain
            # read().semi-join would resolve the WHOLE table first (the
            # semi-join can't push through the max_by resolve) — this
            # pushes the batch keys into every frame of the stack, so
            # the before-image costs O(batch keys), not O(table)
            before = fact.read_for_keys(batch_latest, FACT_KEYS)
        if event_time_wins:
            # the merge resolves matched keys to max event time, so the
            # post-merge state of a batch key is the winner of (existing
            # row, batch row) — deriving `after` from the batch alone
            # would retract a newer fact row in favor of a late older
            # event and permanently diverge gold from the fact. Uses the
            # SAME deterministic source-wins tie-break as the merge
            # itself (resolve_event_time), so an exact event-time tie
            # resolves identically here and in fact.upsert below.
            from ..operators.merge import resolve_event_time

            after = resolve_event_time(
                before, batch_latest.select(*before.columns),
                FACT_KEYS, FACT_ORDER,
            )
        else:
            after = batch_latest
        from ..operators.aggregate import merge_gold, signed_delta

        delta = signed_delta(before, after, dim)
        new_gold = merge_gold(gold.read(), delta)
        # no-op groups keep their rows; zero-count groups (possible only
        # with retraction-to-empty) are dropped
        new_gold = new_gold.filter(F.col("total_bookings") > 0)
    if not fact_replayed:
        if partitioned and merge_on_read:
            fact.upsert_delta(
                derived,
                keys=FACT_KEYS,
                partition_by=FACT_PARTITIONING,
                order_by=FACT_ORDER,
                event_time_wins=event_time_wins,
                txn=txn,
            )
        elif partitioned:
            fact.upsert_pruned(
                derived,
                keys=FACT_KEYS,
                partition_by=FACT_PARTITIONING,
                order_by=FACT_ORDER,
                event_time_wins=event_time_wins,
                txn=txn,
            )
        else:
            fact.upsert(
                derived, keys=FACT_KEYS, order_by=FACT_ORDER,
                event_time_wins=event_time_wins, txn=txn,
            )
    if dim is not None and gold is not None:
        if not _already_applied(gold, app_id, batch_id):
            if maintain_incrementally:
                gold.overwrite(new_gold, txn=txn)
            else:
                gold.overwrite(
                    gold_booking_aggregation(fact.read(), dim), txn=txn
                )


def load_booking_fact_stream(
    spark: SparkSession,
    landing_dir: str,
    fact: ParquetTable,
    quarantine: ParquetTable,
    checkpoint_dir: str,
    dim: DataFrame | None = None,
    gold: ParquetTable | None = None,
    available_now: bool = True,
    partitioned: bool = True,
    max_files_per_trigger: int | None = None,
    event_time_wins: bool = False,
    merge_on_read: bool = True,
    dq_rules: list | None = None,
    dq_on_breach: str = "halt",
    dq_quarantine: ParquetTable | None = None,
    incremental_gold: bool = False,
    processing_time: str = "10 seconds",
):
    """Streaming entry: drain the change-feed landing dir through the merge
    (exactly-once via checkpoint + idempotent merge).

    ``available_now=False`` runs a CONTINUOUS ``processingTime`` trigger
    (r8 — the steady-latency consumer shape; ``processing_time`` sets the
    cadence) and returns the running query without awaiting it.
    ``incremental_gold=True`` maintains gold with retraction deltas every
    batch instead of full re-aggregation (see
    :func:`process_booking_batch`).

    ``dq_rules`` (e.g. :func:`booking_expectations`) arms the per-batch
    expectation gate: the suite is evaluated on the derived rows BEFORE
    the fact merge; a breach either kills the stream pre-commit
    (``dq_on_breach='halt'`` — the reference's stopOnFirstError) or
    diverts breaching rows to ``dq_quarantine`` and publishes the rest.

    ``merge_on_read=True`` (default): steady-state triggers append
    sequence-numbered deltas (O(batch) per trigger) and fold into the
    base every 16th batch — the low-latency path that sustains 1 k-event
    micro-batches above the 1,000 events/s target. Set False to force
    the copy-on-write pruned merge every batch (every version dir is
    then a plain partitioned parquet dataset with no resolve-on-read).

    ``event_time_wins=True``: matched keys resolve to the max event
    ``timestamp`` instead of arrival order, so a replayed or out-of-order
    landing drain converges to the same fact state (the `WHEN MATCHED AND
    s.ts >= t.ts` conditional-MERGE guard)."""
    if dq_rules is not None and dq_on_breach == "quarantine" and dq_quarantine is None:
        raise ValueError(
            "dq_on_breach='quarantine' requires a dq_quarantine table — "
            "breaching rows must not be dropped silently"
        )
    stream = read_change_feed(
        spark, landing_dir, BOOKING_DOC_SCHEMA,
        max_files_per_trigger=max_files_per_trigger,
    )

    # stable per (pipeline, checkpoint): the batch-id sequence is scoped to
    # the checkpoint, so the idempotency marker must be too
    app_id = f"booking_fact:{checkpoint_dir}"

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_booking_batch(
            batch_df, fact, quarantine, dim=dim, gold=gold,
            partitioned=partitioned, event_time_wins=event_time_wins,
            app_id=app_id, batch_id=batch_id, merge_on_read=merge_on_read,
            dq_rules=dq_rules, dq_on_breach=dq_on_breach,
            dq_quarantine=dq_quarantine, incremental_gold=incremental_gold,
        )

    q = run_foreach_batch_merge(
        stream, _process, checkpoint_dir, available_now=available_now,
        processing_time=processing_time,
    )
    if available_now:
        q.awaitTermination()
    return q


def load_booking_fact_batch(
    spark: SparkSession,
    landing_dir: str,
    fact: ParquetTable,
    quarantine: ParquetTable,
    dim: DataFrame | None = None,
    gold: ParquetTable | None = None,
) -> None:
    """Batch variant (one-shot backfill of the whole landing dir)."""
    raw = spark.read.schema(BOOKING_DOC_SCHEMA).json(landing_dir)
    process_booking_batch(raw, fact, quarantine, dim=dim, gold=gold)
