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


def _initial_plan(plan: str) -> str:
    """Normalize an explain string to its INITIAL (pre-execution) plan.

    Once an AdaptiveSparkPlan has executed — the root plan after an
    action, or a cached InMemoryRelation whose build ran — its tree
    string prints BOTH a ``== Final Plan ==`` and an ``== Initial Plan
    ==`` section, so every Exchange/PushedFilters line in it appears
    twice (and the final section gains AQE-only wrappers like
    ShuffleQueryStage). Plan-shape assertions pin the pre-execution
    shape; memoized queries hand tests an already-executed DataFrame
    whenever another test ran them first, so counting the raw string
    makes pinned numbers depend on test ORDER. Dropping every Final
    section leaves exactly the text a never-executed plan prints."""
    out: list[str] = []
    skip_cols: list[int] = []  # indent columns of open Final sections
    for line in plan.splitlines(keepends=True):
        if "== Final Plan ==" in line:
            skip_cols.append(line.index("== Final Plan =="))
            continue
        if "== Initial Plan ==" in line:
            col = line.index("== Initial Plan ==")
            # close the matching Final section (markers pair LIFO; a
            # nested cached plan's markers are strictly deeper-indented
            # than the section that contains it)
            while skip_cols and skip_cols[-1] >= col:
                skip_cols.pop()
            continue
        if not skip_cols:
            out.append(line)
    return "".join(out)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan
    (broadcast exchanges excluded — they are the cheap kind)."""
    plan = _initial_plan(explain_str(df, "simple"))
    return len(re.findall(r"Exchange (?:hash|range|Single)", plan))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan in the plan."""
    plan = _initial_plan(explain_str(df, "formatted"))
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
