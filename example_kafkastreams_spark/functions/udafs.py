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
    aggregate vocabulary, which is why it earns a UDAF.

    Integral inputs take an EXACT path: the formula rearranges to
    ((n+1)·T − 2·S) / (n·T) with S = Σ_i cum_i and T = Σ x — both
    exact integers — so the result is ONE correctly-rounded IEEE
    division of two integers, bit-reproducible by any engine that can
    sort-fold the same integers (the q61 data-card oracle re-derives
    it in SQL as the rank-weighted sum Σ x_i·(n−i+1) = S over the
    ascending sort). Exactness holds while n·T < 2^53 — character
    counts at any per-source grain this report targets; a group past
    that is a data-card misuse, not a precision bug. Float inputs
    keep the float path (no exact contract is possible there)."""
    xv = v.to_numpy()
    n = xv.size
    if n == 0:
        return 0.0
    if np.issubdtype(xv.dtype, np.integer):
        x = np.sort(xv.astype(np.int64))
        T = int(x.sum())
        if T == 0:
            return 0.0
        S = int(np.cumsum(x).sum())
        return float(((n + 1) * T - 2 * S) / (n * T))
    x = np.sort(xv.astype(np.float64))
    if x.sum() == 0:
        return 0.0
    cum = np.cumsum(x)
    # standard formula: 1 - 2 * sum((cum - x/2)) / (n * total)
    return float((n + 1 - 2 * (cum.sum() / cum[-1])) / n)
