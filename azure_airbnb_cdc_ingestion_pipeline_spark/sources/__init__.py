from .readers import load_sf_tables, read_csv, read_json_docs, write_csv_archive
from .tables import ConcurrentWriteError, ParquetTable

__all__ = [
    "ParquetTable",
    "ConcurrentWriteError",
    "load_sf_tables",
    "read_csv",
    "read_json_docs",
    "write_csv_archive",
]
