"""Explicit StructType schemas.

Clickstream model (reference ClickstreamJoinExample.scala:42-60 — case
classes ClientKey/PvKey/Pv/Ev/EvPvKey/EvPv): keys become plain columns
(no wrapper struct, SURVEY.md §1.2), Option[...] becomes nullable, and
event time — Kafka record-timestamp metadata in the reference
(Kafka.scala:45,84) — becomes a first-class ``ts: timestamp`` column.

Testdata tables (TESTDATA.md / FIXTURES.md §3) get explicit schemas so
streaming file sources and createDataFrame fixtures never infer.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(fields: list[tuple[str, T.DataType, bool]]) -> T.StructType:
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable in fields])


# --- clickstream model (reference parity) ---------------------------------

# topic clickstream.page_views: key ClientKey, value Pv
# (ClickstreamJoinExample.scala:48-54,62)
PAGE_VIEW = _s(
    [
        ("client_id", T.StringType(), False),
        ("pv_id", T.StringType(), False),
        ("pv_value", T.StringType(), True),
        ("ts", T.TimestampType(), False),
    ]
)

# topic clickstream.events: key ClientKey, value Ev
# (ClickstreamJoinExample.scala:56,64)
CLICK_EVENT = _s(
    [
        ("client_id", T.StringType(), False),
        ("pv_id", T.StringType(), False),
        ("ev_id", T.StringType(), False),
        ("ev_value", T.StringType(), True),
        ("ts", T.TimestampType(), False),
    ]
)

# topic clickstream.events_enriched: key ClientKey, value EvPv — Option
# pv fields ⇒ nullable (ClickstreamJoinExample.scala:58-60,66)
EV_PV = _s(
    [
        ("client_id", T.StringType(), False),
        ("ev_id", T.StringType(), False),
        ("ev_value", T.StringType(), True),
        ("pv_id", T.StringType(), True),
        ("pv_value", T.StringType(), True),
        ("ts", T.TimestampType(), False),
    ]
)

# DeduplicationExample topic (key/value string, DeduplicationExample.scala:34-40)
DEDUP_RECORD = _s(
    [
        ("k", T.StringType(), False),
        ("v", T.StringType(), True),
        ("ts", T.TimestampType(), False),
    ]
)


# --- driver testdata tables (TESTDATA.md) ---------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": _s(
        [("r_regionkey", T.IntegerType(), True), ("r_name", T.StringType(), True)]
    ),
    "nation": _s(
        [
            ("n_nationkey", T.IntegerType(), True),
            ("n_name", T.StringType(), True),
            ("n_regionkey", T.IntegerType(), True),
        ]
    ),
    "customer": _s(
        [
            ("c_custkey", T.LongType(), True),
            ("c_name", T.StringType(), True),
            ("c_nationkey", T.IntegerType(), True),
            ("c_acctbal", T.DoubleType(), True),
            ("c_mktsegment", T.StringType(), True),
        ]
    ),
    "supplier": _s(
        [
            ("s_suppkey", T.LongType(), True),
            ("s_name", T.StringType(), True),
            ("s_nationkey", T.IntegerType(), True),
            ("s_acctbal", T.DoubleType(), True),
        ]
    ),
    "part": _s(
        [
            ("p_partkey", T.LongType(), True),
            ("p_name", T.StringType(), True),
            ("p_brand", T.StringType(), True),
            ("p_type", T.StringType(), True),
            ("p_size", T.IntegerType(), True),
            ("p_retailprice", T.DoubleType(), True),
        ]
    ),
    "orders": _s(
        [
            ("o_orderkey", T.LongType(), True),
            ("o_custkey", T.LongType(), True),
            ("o_orderstatus", T.StringType(), True),
            ("o_totalprice", T.DoubleType(), True),
            ("o_orderdate", T.TimestampType(), True),
            ("o_orderpriority", T.StringType(), True),
        ]
    ),
    "lineitem": _s(
        [
            ("l_orderkey", T.LongType(), True),
            ("l_partkey", T.LongType(), True),
            ("l_suppkey", T.LongType(), True),
            ("l_linenumber", T.IntegerType(), True),
            ("l_quantity", T.DoubleType(), True),
            ("l_extendedprice", T.DoubleType(), True),
            ("l_discount", T.DoubleType(), True),
            ("l_tax", T.DoubleType(), True),
            ("l_returnflag", T.StringType(), True),
            ("l_linestatus", T.StringType(), True),
            ("l_shipdate", T.TimestampType(), True),
        ]
    ),
    "events": _s(
        [
            ("event_id", T.LongType(), True),
            ("ts", T.TimestampType(), True),
            ("user_id", T.LongType(), True),
            ("event_type", T.StringType(), True),
            ("value", T.DoubleType(), True),
            ("props", T.StringType(), True),
        ]
    ),
    "documents": _s(
        [
            ("doc_id", T.LongType(), True),
            ("text", T.StringType(), True),
            ("lang", T.StringType(), True),
            ("source", T.StringType(), True),
            ("n_chars", T.LongType(), True),
        ]
    ),
    "embeddings": _s(
        [
            ("vec_id", T.LongType(), True),
            ("embedding", T.ArrayType(T.FloatType()), True),
            ("label", T.IntegerType(), True),
        ]
    ),
}

TABLE_NAMES = tuple(TESTDATA_SCHEMAS)
