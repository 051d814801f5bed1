#!/usr/bin/env python
"""Dump .explain("formatted") for declared queries to plans/r11/.

Usage: python tools/dump_plans.py <suffix> [q55,q57,...]
  suffix: "before" or "after" — file name tag
  optional comma-separated name substrings to limit the dump

Eager-build queries (q57/q63 component loops) run their build jobs at
DataFrame-construction time; the plan captured is the final union plan
the bench's noop action executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from example_kafkastreams_spark.queries import QUERIES  # noqa: E402
from example_kafkastreams_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    "r11",
)


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    names = sorted(QUERIES)
    if only:
        names = [n for n in names if any(s in n for s in only)]
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"{name}: {len(text)} chars -> {path}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
