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
        # commit: write pointer to a temp file, atomic-rename over _CURRENT
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
