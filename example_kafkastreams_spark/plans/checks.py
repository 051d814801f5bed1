"""Physical-plan introspection helpers.

The reference's one optimization story is shuffle elimination (the
Processor-API topology avoids repartition topics — README.md:12,
SURVEY.md §4). Spark's analog of a repartition topic is an ``Exchange``
node; these helpers let tests assert plan shape: exchange counts,
pushed parquet filters, whole-stage-codegen coverage.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan
    (broadcast exchanges excluded — they are the cheap kind)."""
    plan = explain_str(df, "simple")
    return len(re.findall(r"Exchange (?:hash|range|Single)", plan))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan in the plan."""
    plan = explain_str(df, "formatted")
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def runtime_bloom_filters(df: DataFrame) -> int:
    """Number of runtime bloom filters Catalyst injected into the
    plan (InjectRuntimeFilter): a ``bloom_filter_agg`` is built on the
    selective join side and a ``might_contain`` probe is pushed into
    the big side's scan, pre-filtering fact rows BEFORE the join
    exchange. The trigger is size-gated
    (``spark.sql.optimizer.runtime.bloomFilter
    .applicationSideScanSizeThreshold``, default 10 GiB) — designed
    for exactly the 100 TB fact-scan case; tests lower the threshold
    to pin the mechanics at local scale."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return len(re.findall(r"bloom_filter_agg\(", plan))
