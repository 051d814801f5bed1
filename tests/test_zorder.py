"""Z-order layout: Morton-code correctness + row-group skipping.

The skipping assertion works at the parquet METADATA level (pyarrow
row-group min/max stats) — the exact statistics a reader's predicate
pushdown consults — so it is deterministic and needs no Spark UI
metrics: a row group is *skippable* for a box query iff its [min,max]
interval misses the box on at least one axis.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from example_kafkastreams_spark.sources.zorder import (
    write_zordered,
    zorder_code,
    zorder_stats,
)


def code_of(spark, a: int, b: int, bits: int, hi: int) -> int:
    stats = {"a": (0, hi), "b": (0, hi)}
    expr = zorder_code(["a", "b"], stats, bits)
    return (
        spark.createDataFrame([(a, b)], "a long, b long")
        .selectExpr(f"{expr} AS z")
        .first()["z"]
    )


def test_morton_interleave_bits(spark):
    # stats (0, 2^bits - 1) make normalization the identity: the code
    # is the textbook bit interleave, col 0 at even positions
    hi = 3  # bits=2 identity range
    assert code_of(spark, 0b11, 0b00, 2, hi) == 0b0101
    assert code_of(spark, 0b00, 0b11, 2, hi) == 0b1010
    assert code_of(spark, 0b11, 0b11, 2, hi) == 0b1111
    assert code_of(spark, 0b10, 0b01, 2, hi) == 0b0110


def test_morton_normalization(spark):
    # constant column -> 0 contribution; negative lo is shifted out
    expr = zorder_code(["a", "b"], {"a": (5, 5), "b": (-4, 3)}, 3)
    row = (
        spark.createDataFrame([(5, 3), (5, -4)], "a long, b long")
        .selectExpr(f"{expr} AS z")
        .collect()
    )
    # b=3 normalizes to 7 (0b111) at odd positions {1,3,5} = 42; b=-4 -> 0
    assert [r["z"] for r in row] == [42, 0]


def test_zorder_code_validates():
    with pytest.raises(ValueError):
        zorder_code([], {}, 16)
    with pytest.raises(ValueError):
        zorder_code(["a", "b", "c", "d"], {c: (0, 1) for c in "abcd"}, 16)


def _groups_intersecting_box(path: str, box: dict[str, tuple[int, int]]):
    """(intersecting, total) row groups for a box query, straight from
    parquet min/max stats — the mechanism predicate pushdown uses."""
    hit = total = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            total += 1
            ok = True
            for col, (lo, hi) in box.items():
                st = rg.column(names.index(col)).statistics
                if st.min > hi or st.max < lo:
                    ok = False
                    break
            if ok:
                hit += 1
    return hit, total


def test_zorder_row_group_skipping(spark, tmp_path):
    """Z-order write: a 2-D box touches FAR fewer row groups than the
    natural layout, and fewer than a 1-D sort (which prunes only the
    leading axis), while the data itself is unchanged."""
    n, m = 60_000, 311
    df = spark.range(n).selectExpr(
        "id",
        f"id % {m} AS x",
        f"(id * 7919) % {m} AS y",
    )
    box = {"x": (100, 140), "y": (100, 140)}
    paths = {}
    for label, writer in (
        ("unsorted", lambda d, p: d.write.option(
            "parquet.block.size", 64 * 1024).mode("overwrite").parquet(p)),
        ("zorder", lambda d, p: write_zordered(
            d, p, ["x", "y"], bits=8, partitions=8,
            block_size=64 * 1024)),
    ):
        p = str(tmp_path / label)
        writer(df, p)
        paths[label] = _groups_intersecting_box(p, box)

    hit_u, tot_u = paths["unsorted"]
    hit_z, tot_z = paths["zorder"]
    # natural order: pseudo-random x/y means ~every group straddles
    assert hit_u == tot_u
    # z-order tiles: the box covers (41/311)^2 ~ 1.7% of the space;
    # allow generous tiling slack but require an order of magnitude
    assert tot_z >= 10 and hit_z <= tot_z // 4

    # layout only — the box RESULT is identical
    got = (
        spark.read.parquet(str(tmp_path / "zorder"))
        .filter("x BETWEEN 100 AND 140 AND y BETWEEN 100 AND 140")
        .count()
    )
    want = df.filter(
        "x BETWEEN 100 AND 140 AND y BETWEEN 100 AND 140"
    ).count()
    assert got == want


def test_zorder_stats_cached_reuse(spark, tmp_path):
    """Passing precomputed stats skips the aggregate pass and yields
    the same layout (byte-identical code expression)."""
    df = spark.range(1000).selectExpr("id % 50 AS x", "id % 37 AS y")
    stats = zorder_stats(df, ["x", "y"])
    assert stats == {"x": (0, 49), "y": (0, 36)}
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_zordered(df, p1, ["x", "y"], bits=8, partitions=2)
    write_zordered(df, p2, ["x", "y"], bits=8, partitions=2, stats=stats)
    a = sorted(map(tuple, spark.read.parquet(p1).collect()))
    b = sorted(map(tuple, spark.read.parquet(p2).collect()))
    assert a == b


def test_zorder_stale_stats_clamp(spark):
    """Values outside the cached stats range clamp to the edge tiles
    instead of aliasing into unrelated ones."""
    from example_kafkastreams_spark.sources.zorder import zorder_code

    expr = zorder_code(["a", "b"], {"a": (0, 3), "b": (0, 3)}, 2)
    rows = (
        spark.createDataFrame([(99, 0), (-5, 0), (3, 3)], "a long, b long")
        .selectExpr(f"{expr} AS z")
        .collect()
    )
    # a=99 clamps to 3 (0b0101), a=-5 clamps to 0, (3,3) -> 0b1111
    assert [r["z"] for r in rows] == [0b0101, 0, 0b1111]
