"""Grouped-aggregate pandas UDFs — the UDAF corner of the §2.8
extension surface (SURVEY.md §2.8 maps the reference's Reducer /
AbstractProcessor lambdas to: built-in expressions first, then
scalar/grouped-agg pandas_udf, then applyInPandasWithState).

Scalar pandas UDFs (neardup.simhash32_udf) and the stateful
Processor analog (streaming/ops.py) already exist; these complete the
matrix with Arrow-vectorized GROUPED_AGG functions: each group's
column arrives as ONE pandas Series per aggregation (Arrow transfer,
no per-row Python), the return is a scalar, and Spark runs partial
aggregation per partition only for algebraic built-ins — a pandas
UDAF is evaluated on the full group, so the group's rows DO shuffle
(the documented cost of arbitrary-function aggregation; keep groups
bounded or prefer expressions).

Every UDAF here is pinned by test to a built-in expression twin —
the extension surface is for functions Catalyst CANNOT express, and
the pin proves the plumbing transfers values exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


@F.pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """Exact per-group median (linear interpolation at even counts —
    numpy's and Spark ``percentile(x, 0.5)``'s shared definition, so
    the expression twin matches bitwise on integer inputs)."""
    return float(np.median(v))


@F.pandas_udf("double")
def gini_udaf(v: pd.Series) -> float:
    """Gini coefficient of a non-negative metric within the group —
    the inequality summary a corpus report wants per source (token
    budget concentration); genuinely outside Catalyst's built-in
    aggregate vocabulary, which is why it earns a UDAF."""
    x = np.sort(v.to_numpy(dtype=np.float64))
    n = x.size
    if n == 0 or x.sum() == 0:
        return 0.0
    cum = np.cumsum(x)
    # standard formula: 1 - 2 * sum((cum - x/2)) / (n * total)
    return float((n + 1 - 2 * (cum.sum() / cum[-1])) / n)
