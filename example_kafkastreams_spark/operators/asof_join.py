"""Interval / as-of joins (reference §2.3 J1/J2).

J1 (DSL, ClickstreamJoinExample.scala:222-234): windowed stream-stream
LEFT join — equi-keys plus symmetric time proximity |l.ts - r.ts| <= w.

J2 (Processor API, ClickstreamJoinExample.scala:314-365): asymmetric
*look-back* variant — for an event at time t, match right-side rows in
[t - w, t]; ONE match wins; unmatched ⇒ NULL right side. SURVEY.md §2.3
canonicalizes this as-of style look-back as the engine's primary
semantics. Deviation from the reference, documented: the processor's
range scan takes the *earliest* match in the window
(ClickstreamJoinExample.scala:360-365 breaks on first fetch hit); we
take the *latest* right row ≤ t (standard as-of semantics — the most
recent page view is the one that caused the event). Earliest-wins is
available via ``pick="earliest"``.

Scale notes: both shapes are an equi-hash join on the keys with the time
predicate evaluated as a post-join filter — one exchange per side, no
theta-join blowup. First-match reduction is a hash aggregation keyed by
the left row id (``max_by``/``min_by`` over the right payload struct):
partial aggregation collapses multi-matches map-side, so the shuffle
after the join carries at most one right payload per left row. A
``row_number`` window would sort; the agg formulation doesn't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_left_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback_seconds: float = 15.0,
    lookahead_seconds: float = 0.0,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """All-matches interval left join (J1 when lookahead==lookback).

    Returns (joined, left_aliased, right_aliased); columns are accessed
    via aliases ``l`` / ``r``.
    """
    l = left.alias("l")
    r = right.alias("r")
    cond = F.lit(True)
    for k in on:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        cond
        & (rts >= lts - F.expr(f"INTERVAL {lookback_seconds} SECONDS"))
        & (rts <= lts + F.expr(f"INTERVAL {lookahead_seconds} SECONDS"))
    )
    return l.join(r, cond, "left"), l, r


def asof_lookback_left_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_id: str,
    right_payload: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback_seconds: float = 15.0,
    right_order: list[str] | None = None,
    pick: str = "latest",
) -> DataFrame:
    """J2: look-back as-of LEFT join, one right match per left row.

    ``left_id`` must uniquely identify left rows (tie-break / regroup
    key). Output = all left columns + ``right_payload`` columns (NULL
    when unmatched within the look-back window).
    """
    joined, l, r = interval_left_join(
        left, right, on, left_ts, right_ts, lookback_seconds, 0.0
    )
    right_order = right_order or [right_ts]
    ordering = F.struct(*[F.col(f"r.{c}") for c in right_order])
    payload = F.struct(*[F.col(f"r.{c}").alias(c) for c in right_payload])
    best = F.max_by(payload, ordering) if pick == "latest" else F.min_by(payload, ordering)
    left_cols = [F.col(f"l.{c}") for c in left.columns]
    out = (
        joined.groupBy(*left_cols)
        .agg(best.alias("m"))
        .select(*[c for c in left.columns], *[F.col(f"m.{c}").alias(c) for c in right_payload])
    )
    return out
