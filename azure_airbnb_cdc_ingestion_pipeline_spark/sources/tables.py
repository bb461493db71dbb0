"""Versioned parquet tables — the warehouse-table abstraction.

The reference's sinks are Synapse DW tables written via staged COPY with
keyed upsert (/root/reference/dataflow/BookingDataTransformation.json:156-186,
/root/reference/pipeline/LoadCustomerDim.json:82-101). Delta Lake is not
available in this environment, so ``ParquetTable`` provides the minimal
transactional surface those sinks need on plain parquet:

- snapshot reads (readers always see one complete version),
- atomic overwrite (write a new version directory, then atomically swap a
  pointer file — the rename is the commit point),
- keyed upsert (MERGE) built from the pure-DataFrame merge in
  ``operators.merge``.

Scale posture: one version = one parquet dataset written fully in parallel
by executors; the only driver-side work is the pointer swap. A real 100 TB
deployment would swap this class for Delta/Iceberg MERGE (file-level
pruning, conflict detection) — the operator layer above is
storage-agnostic, callers only see DataFrames.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_POINTER = "_CURRENT"


class ParquetTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- version bookkeeping -------------------------------------------------
    def _pointer_path(self) -> str:
        return os.path.join(self.root, _POINTER)

    def current_version(self) -> int | None:
        try:
            with open(self._pointer_path()) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def _version_dir(self, v: int) -> str:
        return os.path.join(self.root, f"v{v:06d}")

    def exists(self) -> bool:
        return self.current_version() is not None

    # -- reads ---------------------------------------------------------------
    def read(self) -> DataFrame:
        v = self.current_version()
        if v is None:
            raise FileNotFoundError(f"table at {self.root} has no committed version")
        return self.spark.read.parquet(self._version_dir(v))

    # -- writes --------------------------------------------------------------
    def overwrite(self, df: DataFrame, partition_by: list[str] | None = None) -> None:
        """Atomic full overwrite: parallel parquet write of v_{n+1}, then a
        POSIX-atomic pointer rename (the commit). Old versions are pruned
        lazily, never the one being read."""
        v = (self.current_version() or 0) + 1
        target = self._version_dir(v)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)
        self._commit(v)

    def _commit(self, v: int) -> None:
        """Write pointer to a temp file, atomic-rename over _CURRENT — the
        POSIX-atomic commit point — then prune old versions."""
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix="._ptr")
        with os.fdopen(fd, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._pointer_path())
        self._vacuum(keep=2)

    def _vacuum(self, keep: int = 2) -> None:
        cur = self.current_version() or 0
        for name in os.listdir(self.root):
            if name.startswith("v") and name[1:].isdigit():
                if int(name[1:]) <= cur - keep:
                    shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)

    def upsert(
        self,
        source: DataFrame,
        keys: list[str],
        order_by: list[str] | None = None,
    ) -> None:
        """Keyed insert-or-update (MERGE). Creates the table if absent.

        Reproduces the reference's upsert sinks: fact sink keyed on
        booking_id with insert+update, no delete
        (/root/reference/dataflow/BookingDataTransformation.json:156-186)
        and the SCD-Type-1 dim upsert keyed on customer_id
        (/root/reference/pipeline/LoadCustomerDim.json:82-101).
        """
        from ..operators.merge import merge_dataframes, latest_per_key

        if not self.exists():
            first = (
                latest_per_key(source, keys, order_by) if order_by else source
            )
            self.overwrite(first)
            return
        merged = merge_dataframes(self.read(), source, keys, order_by=order_by)
        self.overwrite(merged)

    # -- scale paths ---------------------------------------------------------
    def _leaf_partition_dirs(self, vdir: str) -> list[str]:
        """Relative paths of leaf partition directories (dirs that directly
        contain parquet files)."""
        out = []
        for dirpath, _dirnames, filenames in os.walk(vdir):
            if any(f.endswith(".parquet") for f in filenames):
                out.append(os.path.relpath(dirpath, vdir))
        return out

    @staticmethod
    def _link_tree(src: str, dst: str) -> None:
        """Hardlink every file under src into the same relative layout under
        dst — metadata-only 'copy' of committed immutable parquet files."""
        for dirpath, _dirnames, filenames in os.walk(src):
            rel = os.path.relpath(dirpath, src)
            tgt = os.path.join(dst, rel) if rel != "." else dst
            os.makedirs(tgt, exist_ok=True)
            for f in filenames:
                if f.endswith(".parquet"):
                    os.link(os.path.join(dirpath, f), os.path.join(tgt, f))

    def append(self, df: DataFrame) -> None:
        """O(batch) append: write only the new rows, hardlink the previous
        version's files alongside them, swap the pointer. Replaces
        read-union-rewrite (which is O(table) per batch and quadratic over
        a stream's lifetime). File names carry write-UUIDs, so links and
        fresh files never collide."""
        if not self.exists():
            self.overwrite(df)
            return
        v = (self.current_version() or 0) + 1
        target = self._version_dir(v)
        df.write.mode("overwrite").parquet(target)
        self._link_tree(self._version_dir(v - 1), target)
        self._commit(v)

    def upsert_pruned(
        self,
        source: DataFrame,
        keys: list[str],
        partition_by: list[str],
        order_by: list[str] | None = None,
    ) -> None:
        """Partition-pruned MERGE: rewrite ONLY the partitions the source
        batch touches; untouched partitions are hardlinked into the new
        version (a metadata op). This is the 100 TB CDC steady state —
        per-batch cost is proportional to the affected partitions, not the
        table (the same contract as a Delta MERGE with a partition-pruning
        ON-clause predicate).

        Correctness precondition (same as Delta's pruned merge): the
        partition attributes are immutable per key (e.g. a booking's
        booking_year/month never changes across updates). A key whose
        partition value changed would leave its old row in the untouched
        partition.
        """
        from ..operators.merge import latest_per_key, merge_dataframes

        src = latest_per_key(source, keys, order_by)
        if not self.exists():
            self.overwrite(src, partition_by=partition_by)
            return

        combos = [tuple(r) for r in src.select(*partition_by).distinct().collect()]
        affected_rels = {
            "/".join(f"{c}={v}" for c, v in zip(partition_by, combo))
            for combo in combos
        }
        cur = self.current_version() or 0
        cur_dir = self._version_dir(cur)

        tgt = self.read()
        pred = F.lit(False)
        for combo in combos:
            match = F.lit(True)
            for c, v in zip(partition_by, combo):
                match = match & (F.col(c) == F.lit(v))
            pred = pred | match
        affected_tgt = tgt.filter(pred)  # partition-pruned scan
        merged = merge_dataframes(affected_tgt, src, keys, order_by=order_by)

        v = cur + 1
        target = self._version_dir(v)
        merged.write.mode("overwrite").partitionBy(*partition_by).parquet(target)
        for rel in self._leaf_partition_dirs(cur_dir):
            if rel not in affected_rels:
                self._link_tree(
                    os.path.join(cur_dir, rel), os.path.join(target, rel)
                )
        self._commit(v)

    def compact(
        self,
        target_rows_per_file: int = 1_000_000,
        partition_by: list[str] | None = None,
    ) -> None:
        """Bin-pack the current version into ~target-sized files (the
        OPTIMIZE analog). Incremental appends/merges accumulate small
        files (one per micro-batch task); a periodic compaction keeps scan
        task counts and footer overhead bounded. Row-count proxy sizing:
        files ≈ ceil(rows / target_rows_per_file)."""
        df = self.read()
        n = df.count()
        n_files = max(1, -(-n // target_rows_per_file))
        if partition_by:
            self.overwrite(
                df.repartition(n_files, *partition_by), partition_by=partition_by
            )
        else:
            self.overwrite(df.repartition(n_files))
