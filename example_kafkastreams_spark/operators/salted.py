"""Salted equi-join: the standard hot-key mitigation for skewed joins.

At 100 TB a handful of hot keys (one viral user, one default value)
can put an entire join's runtime on one task. AQE's skew-join split
(enabled in session.py) handles sort-merge cases adaptively; salting
is the explicit, planner-independent form — and the only option when
the skew is in an aggregation-then-join or the engine can't split
(e.g. bucketed inputs).

Scheme: the fact side gets a deterministic salt in [0, salts) derived
from a high-cardinality column (NOT the join key — rows of the SAME
hot key must spread across salts); the dim side replicates each row
``salts`` times. The join key becomes (key, salt): each hot key now
lands on ``salts`` tasks instead of one. Cost: dim side inflates by
the salt factor — use for fact⋈dim, never fact⋈fact.

Result is row-identical to the unsalted join (the declared query q37
is oracle-checked against the PLAIN join SQL — salting must be
invisible in the output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_equijoin(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_source: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join fact⋈dim on fact_key=dim_key with ``salts``-way salting.

    ``salt_source`` is a fact column of high cardinality (an event id,
    a line number) whose hash spreads a hot key's rows evenly;
    ``pmod(hash(...))`` keeps it deterministic, so the operator stays
    re-runnable and cross-engine verifiable.

    Only ``inner`` and ``left`` are output-invariant under salting: an
    unmatched DIM row exists ``salts`` times post-explode, so right /
    full-outer joins would emit it once per salt copy — silently
    diverging from the plain join.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_equijoin supports how='inner'|'left', got {how!r}: "
            "dim-side salt replication emits each unmatched dim row "
            "`salts` times under right/full_outer"
        )
    f = fact.withColumn(
        "__salt", F.pmod(F.hash(F.col(salt_source)), F.lit(salts))
    )
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(s) for s in range(salts)]))
    )
    joined = f.join(
        d,
        (f[fact_key] == d[dim_key]) & (f["__salt"] == d["__salt"]),
        how,
    )
    return joined.drop("__salt")
