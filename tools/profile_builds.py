#!/usr/bin/env python
"""Per-query WARM build profiler: driver-side DataFrame-construction
cost (wall + py4j roundtrip count) for every declared query.

Builds each query twice; the second (warm — memos populated, scans
cached) build is the cost every bench re-invocation pays before any
job runs. Roundtrip counts are deterministic under CPU contention,
wall is not. No noop run — this isolates §7.3 driver-side fixed work.

Usage: python tools/profile_builds.py [sf_dir] [--only q55,q58]
"""

from __future__ import annotations

import sys
import time

sf_dir = "/root/testdata/sf0.1"
only = None
argv = sys.argv[1:]
i = 0
while i < len(argv):
    a = argv[i]
    if a == "--only" and i + 1 < len(argv):
        only = argv[i + 1].split(",")
        i += 2
        continue
    if not a.startswith("--"):
        sf_dir = a
    i += 1

from py4j.java_gateway import GatewayClient  # noqa: E402

_calls = [0]
_orig = GatewayClient.send_command


def _counted(self, *a, **k):
    _calls[0] += 1
    return _orig(self, *a, **k)


GatewayClient.send_command = _counted

import importlib.util  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry)
QUERIES = entry.queries()

from example_kafkastreams_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="profile-builds")
spark.sparkContext.setLogLevel("ERROR")
spark.range(10).count()

rows = []
for name in sorted(QUERIES):
    if only and not any(s in name for s in only):
        continue
    fn = QUERIES[name]
    fn(spark, sf_dir)  # cold build: populate memos/persists
    t0 = time.perf_counter()
    c0 = _calls[0]
    fn(spark, sf_dir)  # warm build
    dt = time.perf_counter() - t0
    dc = _calls[0] - c0
    rows.append((name, dt, dc))
    print(f"{name:38s} warm_build={dt:7.3f}s py4j={dc:6d}", flush=True)

rows.sort(key=lambda r: -r[1])
print("\n== top by warm build wall ==")
for name, dt, dc in rows[:15]:
    print(f"{name:38s} {dt:7.3f}s py4j={dc}")
print(f"\nTOTAL warm build: {sum(r[1] for r in rows):.1f}s "
      f"py4j={sum(r[2] for r in rows)}")
