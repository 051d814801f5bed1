#!/usr/bin/env python
"""Profile one declared query the way the bench times it.

Usage: python tools/profile_query.py q55 [--runs 2] [--branches]

Per run: build time (Python DataFrame construction, includes eager
build jobs), noop-sink execution time, and shuffle-write delta from
the UI REST API. --branches additionally times each union branch via
the bench's discriminator-filter trick.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from example_kafkastreams_spark.queries import QUERIES  # noqa: E402
from example_kafkastreams_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def shuffle_totals(spark):
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return None
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE"
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            stages = json.load(r)
    except OSError:
        return None
    return (
        sum(s.get("shuffleWriteRecords", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def main() -> int:
    sub = sys.argv[1]
    runs = 2
    branches = "--branches" in sys.argv
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    names = [n for n in sorted(QUERIES) if sub in n]
    spark = get_spark(
        app_name="profile",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    from example_kafkastreams_spark.catalog import load_table as _lt
    from example_kafkastreams_spark.schemas import TABLE_NAMES as _tables

    for t in _tables:
        _lt(spark, SF_DIR, t).limit(1).count()

    from example_kafkastreams_spark.operators.cache import (
        release_sketch_caches,
    )
    from pyspark.sql import functions as F

    for name in names:
        for i in range(runs):
            before = shuffle_totals(spark)
            t0 = time.perf_counter()
            df = QUERIES[name](spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            after = shuffle_totals(spark)
            shuf = (
                (after[0] - before[0], after[1] - before[1])
                if before and after
                else None
            )
            print(
                json.dumps(
                    {
                        "query": name,
                        "run": i,
                        "build_sec": round(t1 - t0, 3),
                        "noop_sec": round(t2 - t1, 3),
                        "total_sec": round(t2 - t0, 3),
                        "shuffle": shuf,
                    }
                ),
                flush=True,
            )
            release_sketch_caches()
        if branches:
            df = QUERIES[name](spark, SF_DIR)
            disc = "mode" if "mode" in df.columns else (
                "method" if "method" in df.columns else None
            )
            if disc:
                modes = [
                    r[0]
                    for r in df.select(disc).distinct().collect()
                ]
                for m in sorted(modes):
                    t0 = time.perf_counter()
                    QUERIES[name](spark, SF_DIR).filter(
                        F.col(disc) == m
                    ).write.format("noop").mode("overwrite").save()
                    print(
                        json.dumps(
                            {
                                "query": name,
                                "branch": m,
                                "noop_sec": round(
                                    time.perf_counter() - t0, 3
                                ),
                            }
                        ),
                        flush=True,
                    )
                    release_sketch_caches()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
