from .aggregate import gold_booking_aggregation
from .derive import derive
from .lookup import lookup_latest
from .merge import latest_per_key, merge_dataframes
from .project import select_map
from .split import conditional_split
from .windows import topk_per_group

__all__ = [
    "conditional_split",
    "derive",
    "gold_booking_aggregation",
    "latest_per_key",
    "lookup_latest",
    "merge_dataframes",
    "select_map",
    "topk_per_group",
]
