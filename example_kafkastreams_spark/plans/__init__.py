from .checks import (
    count_exchanges,
    explain_str,
    pushed_filters,
    runtime_bloom_filters,
)

__all__ = [
    "count_exchanges",
    "explain_str",
    "pushed_filters",
    "runtime_bloom_filters",
]
