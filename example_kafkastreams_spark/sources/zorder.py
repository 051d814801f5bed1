"""Z-order (Morton-interleaved) clustered parquet layout.

Date partitioning prunes ONE dimension; a 2-D box query (e.g. part
range AND supplier range) over a 100 TB fact table needs the LAYOUT to
cluster both. Sorting by the Morton interleave of the keys' bits makes
each parquet row group a k-dimensional tile, so the reader's row-group
min/max stats skip every group the box cannot intersect — on EITHER
axis, not just the leading sort column.

The interleave is a pure column expression (``shiftright``/``&``/
``shiftleft`` folds — whole-stage codegen, no UDF): each key is
min-max-normalized to ``bits`` bits (with raw values the wider key's
high bits dominate the code and the curve degenerates to a worse
single-column sort), then bit ``i`` of column ``c`` lands at position
``i*k + c``. Computed once at write time; the layout is just a sort
order, readable by ANY parquet reader with zero runtime cost.

Reference parity: the reference engine has no clustered-layout writer
(its runtime is a Kafka Streams topology,
/root/reference/src/main/scala/example/Kafka.scala); this is part of
the batch-source surface a 100 TB deployment needs. Promoted from the
round-5 bench demo (bench.py ``zorder_box_query``: 600k → 65k input
records on the same box query vs the unsorted layout at sf0.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_stats(df: DataFrame, cols: list[str]) -> dict[str, tuple[int, int]]:
    """One aggregate pass collecting per-column (min, max) — the only
    driver-side data the layout needs (2·k integers)."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("bigint")).alias(f"__lo_{c}"))
        aggs.append(F.max(F.col(c).cast("bigint")).alias(f"__hi_{c}"))
    row = df.agg(*aggs).first()
    return {c: (row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in cols}


def zorder_code(
    cols: list[str],
    stats: dict[str, tuple[int, int]],
    bits: int = 16,
) -> str:
    """SQL expression for the Morton code of ``cols`` (integral-typed;
    cast doubles to a fixed-point bigint first).

    ``k * bits`` must fit a signed 64-bit value; 16 bits per key is
    enough tiling resolution for row-group-level skipping (a 128 MB
    row group holds ~1M rows — far coarser than a 65536-cell axis).
    Constant columns (min == max) normalize to 0 and contribute
    nothing, which is exactly right — there is nothing to cluster.
    """
    k = len(cols)
    if k < 1:
        raise ValueError("need at least one column")
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds 63 code bits")
    top = (1 << bits) - 1
    norms = []
    for c in cols:
        lo, hi = stats[c]
        if lo is None or hi is None or hi <= lo:
            norms.append("CAST(0 AS BIGINT)")
        else:
            # Clamp the VALUE into [lo, hi] before any arithmetic:
            # cached/stale stats may not cover new rows, and an
            # out-of-range value would otherwise alias into an
            # unrelated tile — or overflow the multiply. The scaling
            # itself runs in DECIMAL(38,0): (hi-lo) can approach the
            # full bigint range, and (val-lo) * 65535 would wrap a
            # signed 64-bit intermediate (silently scrambling the
            # layout, or erroring under ANSI mode). 38 digits hold
            # 2^64 * 2^16 with room to spare; the DIV result is back
            # in [0, top] so the final cast to BIGINT is exact.
            clamped = (
                f"least(greatest(CAST({c} AS BIGINT),"
                f" CAST({lo} AS BIGINT)), CAST({hi} AS BIGINT))"
            )
            norms.append(
                f"CAST((CAST({clamped} AS DECIMAL(38,0))"
                f" - CAST({lo} AS DECIMAL(38,0))) * {top}"
                f" DIV CAST({hi - lo} AS DECIMAL(38,0)) AS BIGINT)"
            )
    return " + ".join(
        f"shiftleft(shiftright({norms[c]}, {i}) & 1, {i * k + c})"
        for i in range(bits)
        for c in range(k)
    )


def zorder_sorted(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    partitions: int = 16,
    stats: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """``df`` re-laid-out in Z-order: range-partitioned AND
    sorted-within-partitions by the Morton code (so row groups are
    contiguous tiles of the space-filling curve), code column dropped.

    Scale: one stats aggregate (skippable by passing cached ``stats``
    — e.g. yesterday's, since min/max drift slowly on append-mostly
    facts), then a single range-exchange of the rows — the same cost
    as any global sort, paid once at write time.
    """
    stats = stats or zorder_stats(df, cols)
    return (
        df.withColumn("__z", F.expr(zorder_code(cols, stats, bits)))
        .repartitionByRange(partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    partitions: int = 16,
    block_size: int | None = None,
    stats: dict[str, tuple[int, int]] | None = None,
) -> None:
    """Write ``df`` to ``path`` as Z-order-clustered parquet.

    ``block_size`` shrinks row groups for small-scale tests (the bench
    uses 128 KiB so sf0.1 has enough groups to measure skipping); at
    production scale leave the 128 MiB default — skipping granularity
    IS the row group.
    """
    w = zorder_sorted(df, cols, bits, partitions, stats).write
    if block_size is not None:
        w = w.option("parquet.block.size", block_size)
    w.mode("overwrite").parquet(path)
