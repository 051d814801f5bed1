"""Mirror of the driver's DuckDB oracle comparison, for local tests:
row count + column set + order-insensitive value comparison (floats
approximate)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from example_kafkastreams_spark.schemas import TABLE_NAMES


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.execute(sql).fetch_df()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_matches_oracle(spark_df, sql: str, sf_dir: str, rel_tol: float = 1e-9):
    got = _canon(spark_df.toPandas())
    want = _canon(duckdb_run(sql, sf_dir))
    assert sorted(got.columns) == sorted(want.columns), (
        f"columns differ: {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count {len(got)} vs oracle {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            for i, (a, b) in enumerate(zip(g, w)):
                an, bn = pd.isna(a), pd.isna(b)
                assert an == bn, f"{c}[{i}]: nullness {a} vs {b}"
                if not an:
                    assert math.isclose(a, b, rel_tol=rel_tol, abs_tol=1e-9), (
                        f"{c}[{i}]: {a} vs {b}"
                    )
        else:
            ga, wa = g.astype(object), w.astype(object)
            mismatch = [
                (i, a, b)
                for i, (a, b) in enumerate(zip(ga, wa))
                if (pd.isna(a) != pd.isna(b)) or (not pd.isna(a) and a != b)
            ]
            assert not mismatch, f"{c}: first mismatches {mismatch[:5]}"
