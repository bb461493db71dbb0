"""LoadCustomerDim — batch dimension load with per-file lifecycle.

Reference entry point 2 (SURVEY §3.2,
/root/reference/pipeline/LoadCustomerDim.json):
GetMetadata(childItems) lists the raw folder → sequential ForEach → per
file: Copy(CSV → SCD1 upsert on customer_id, string→typed coercion) →
Copy(archive, quoteAllText) → Delete(source).

Driver-side FS ops are metadata-only (list/copy/delete of file handles);
all data-plane work is executor-parallel Spark. Sequential per-file order
preserves the reference's lifecycle atomicity (a file is archived+deleted
only after its upsert commits).
"""

from __future__ import annotations

import logging
import os
import shutil

from pyspark.sql import SparkSession

from ..schemas import CUSTOMER_DIM_SCHEMA
from ..sources.readers import cast_to_schema, read_csv
from ..sources.tables import ParquetTable

log = logging.getLogger(__name__)

DIM_KEYS = ["customer_id"]


def list_files(raw_dir: str, suffix: str = ".csv") -> list[str]:
    """GetMetadata childItems analog: name-sorted file listing (hourly drop
    names sort chronologically)."""
    if not os.path.isdir(raw_dir):
        return []
    return sorted(
        os.path.join(raw_dir, f)
        for f in os.listdir(raw_dir)
        if f.endswith(suffix)
    )


def load_customer_dim(
    spark: SparkSession,
    raw_dir: str,
    dim: ParquetTable,
    archive_dir: str,
    delete_source: bool = True,
) -> int:
    """Run the full lifecycle over every pending file; returns files
    processed. SCD Type 1: the incoming row fully overwrites the matched
    dim row (whenMatchedUpdateAll), new keys insert."""
    os.makedirs(archive_dir, exist_ok=True)
    files = list_files(raw_dir)
    for path in files:
        raw = read_csv(spark, path)  # string-first ingestion
        typed = cast_to_schema(raw, CUSTOMER_DIM_SCHEMA)
        dim.upsert(typed, keys=DIM_KEYS)
        # archive: byte-for-byte copy of the processed file, then delete
        shutil.copy2(path, os.path.join(archive_dir, os.path.basename(path)))
        if delete_source:
            os.remove(path)
        log.info("customer_dim: processed %s", path)
    return len(files)
