from .dedup import (
    dedup_emission_anchored,
    dedup_exact,
    dedup_tumbling_window,
)
from .asof_join import asof_lookback_left_join, interval_left_join
from .enrich import enrich_clickstream, split_clickstream
from .index_maint import COMPACTED_RUN, compact_index

__all__ = [
    "COMPACTED_RUN",
    "compact_index",
    "dedup_tumbling_window",
    "dedup_exact",
    "dedup_emission_anchored",
    "asof_lookback_left_join",
    "interval_left_join",
    "enrich_clickstream",
    "split_clickstream",
]
