from .readers import load_sf_tables, read_csv, read_json_docs, write_csv_archive
from .tables import ParquetTable

__all__ = [
    "ParquetTable",
    "load_sf_tables",
    "read_csv",
    "read_json_docs",
    "write_csv_archive",
]
