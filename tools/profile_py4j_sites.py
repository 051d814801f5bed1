#!/usr/bin/env python
"""Attribute py4j roundtrips during a query's WARM build to repo call
sites. Monkeypatches GatewayClient.send_command to walk the Python
stack and charge the call to the innermost example_kafkastreams_spark
frame (file:line:function). Deterministic under contention.

Usage: python tools/profile_py4j_sites.py <query> [sf_dir] [--top N]
"""

from __future__ import annotations

import sys
from collections import Counter

argv = [a for a in sys.argv[1:] if not a.startswith("--")]
qname = argv[0]
sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
top = 40
if "--top" in sys.argv:
    top = int(sys.argv[sys.argv.index("--top") + 1])

from py4j.java_gateway import GatewayClient  # noqa: E402

_sites: Counter = Counter()
_on = [False]
_orig = GatewayClient.send_command


def _attributed(self, *a, **k):
    if _on[0]:
        f = sys._getframe(1)
        site = None
        while f is not None:
            fn = f.f_code.co_filename
            if "example_kafkastreams_spark" in fn or fn.endswith(
                "__spark_entry__.py"
            ):
                short = fn.rsplit("/", 1)[-1]
                site = f"{short}:{f.f_lineno}:{f.f_code.co_name}"
                break
            f = f.f_back
        _sites[site or "<non-repo>"] += 1
    return _orig(self, *a, **k)


GatewayClient.send_command = _attributed

import importlib.util  # noqa: E402
import os  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry)
QUERIES = entry.queries()

from example_kafkastreams_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="profile-py4j-sites")
spark.sparkContext.setLogLevel("ERROR")
spark.range(10).count()

name = next(n for n in sorted(QUERIES) if qname in n)
fn = QUERIES[name]
fn(spark, sf_dir)  # cold: populate memos
import time  # noqa: E402

_on[0] = True
t0 = time.perf_counter()
fn(spark, sf_dir)  # warm, attributed
dt = time.perf_counter() - t0
_on[0] = False

total = sum(_sites.values())
print(f"\n{name}: warm build {dt:.3f}s, {total} py4j roundtrips")
for site, n in _sites.most_common(top):
    print(f"{n:6d}  {site}")
