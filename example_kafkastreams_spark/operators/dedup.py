"""Deduplication operators.

Reference semantics (SURVEY.md §2.4):

- A1 — windowed dedup via first-wins reduce:
  ``groupByKey().windowedBy(TimeWindows.of(w)).reduce((a, _) => a)``
  (ClickstreamJoinExample.scala:243-257): per (key, tumbling window) keep
  the FIRST record. Batch analog: :func:`dedup_tumbling_window`.

- A2 — emission-anchored dedup (Processor API,
  DeduplicationExample.scala:126-142): suppress a record iff a record
  with the same key was *emitted* within the trailing window; windows are
  anchored at the last emission, not bucket-aligned. Not expressible in
  single-pass SQL (state depends on prior emissions); batch analog via
  per-key ordered scan in :func:`dedup_emission_anchored`.

Scale notes: A1 is a hash aggregation with ``min_by`` over a struct —
Catalyst plans partial (map-side) aggregation before the single shuffle
on (key, window), so duplicate-heavy data collapses before the exchange.
That is the property that keeps it viable at 100 TB; a
``row_number()``-based formulation would instead sort every partition.
A2 shuffles once on the key and streams each group through Arrow in
timestamp order; state per key is O(1) (last emission time).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _ordering_struct(order_cols: Iterable[str]) -> F.Column:
    # struct comparison is lexicographic — a deterministic total order as
    # long as the caller includes a unique tie-break column (e.g. event_id).
    return F.struct(*[F.col(c) for c in order_cols])


def dedup_tumbling_window(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    window_duration: str = "1 day",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """A1: keep the first record per (keys..., tumbling window).

    "First" = smallest (ts, *order_cols) — the reference's ``reduce((a,_)
    => a)`` keeps the first *arrival*; in batch we canonicalize arrival
    order to event-time order with a unique tie-break for determinism.

    Output: keys + ``window_start`` + all original columns of the
    surviving row.
    """
    order_cols = order_cols or []
    ordering = _ordering_struct([ts_col, *order_cols])
    payload = F.struct(*[F.col(c) for c in df.columns])
    win = F.window(F.col(ts_col), window_duration)
    out = (
        df.groupBy(*keys, win.alias("window"))
        .agg(F.min_by(payload, ordering).alias("first_rec"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("first_rec.*"),
        )
    )
    return out


def dedup_exact(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Exact dedup on ``keys``: one deterministic survivor per key group.

    ``dropDuplicates`` keeps an *arbitrary* row — fine for streaming, but
    nondeterministic for oracle comparison — so the batch canonical form
    picks the row with the smallest ``order_cols`` tuple via ``min_by``
    (again: partial-agg before the shuffle, no sort).
    """
    order_cols = order_cols or [c for c in df.columns if c not in keys][:1]
    payload = F.struct(*[F.col(c) for c in df.columns])
    return (
        df.groupBy(*keys)
        .agg(F.min_by(payload, _ordering_struct(order_cols)).alias("first_rec"))
        .select("first_rec.*")
    )


def dedup_emission_anchored(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    window_seconds: float = 15.0,
) -> DataFrame:
    """A2: exact Processor-API semantics (DeduplicationExample.scala:133-141).

    Per key, scanning records in event-time order: emit a record iff no
    record with the same key was emitted in the last ``window_seconds``;
    emitting re-anchors the window. The golden sequence (FIXTURES.md §2.2)
    0/1/3/7/17 s ⇒ emit at 0 and 17.

    Implemented with ``applyInPandas``: one shuffle on ``keys``, then an
    Arrow-batched linear scan per group. Declared rows-only for the
    oracle (SQL cannot express emission-anchored state).
    """
    schema = df.schema
    key_cols = list(keys)
    ts = ts_col
    win = float(window_seconds)

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts] + [c for c in pdf.columns if c != ts], kind="mergesort")
        t = pdf[ts].astype("int64").to_numpy() / 1e9  # ns → s
        keep = []
        last_emit = None
        for i in range(len(pdf)):
            if last_emit is None or t[i] - last_emit > win:
                keep.append(i)
                last_emit = t[i]
        return pdf.iloc[keep]

    return df.groupBy(*key_cols).applyInPandas(scan, schema=schema)
