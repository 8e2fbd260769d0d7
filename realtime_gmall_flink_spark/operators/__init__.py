from .dedup import latest_row_per_key, exact_dedup
from .visitor import first_visit_repair, first_per_period, gap_flag
from .jumpout import jump_out_batch
from .windows import tumble, tumble_agg
from .routing import route_by_config, split_by_predicates

__all__ = [
    "latest_row_per_key",
    "exact_dedup",
    "first_visit_repair",
    "first_per_period",
    "gap_flag",
    "jump_out_batch",
    "tumble",
    "tumble_agg",
    "route_by_config",
    "split_by_predicates",
]
