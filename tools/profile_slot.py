#!/usr/bin/env python
"""Profile one declared slot standalone: build + noop with UI on,
then dump per-job wall (with job descriptions/groups) and the top
stages by executor time — the round-11 attribution helper.

Usage: python tools/profile_slot.py q63_corpus_funnel [sf_dir]
"""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from example_kafkastreams_spark.queries import QUERIES  # noqa: E402
from example_kafkastreams_spark.session import get_spark  # noqa: E402


def main() -> None:
    qname = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name=f"profile-{qname}",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.schemas import TABLE_NAMES

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).limit(1).count()

    t0 = time.perf_counter()
    df = QUERIES[qname](spark, sf_dir)
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t_noop = time.perf_counter() - t0
    # warm re-invocation (memoized slots serve from cache)
    t0 = time.perf_counter()
    df2 = QUERIES[qname](spark, sf_dir)
    t_rebuild = time.perf_counter() - t0
    t0 = time.perf_counter()
    df2.write.format("noop").mode("overwrite").save()
    t_renoop = time.perf_counter() - t0

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs") as r:
        jobs = json.load(r)
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE"
    ) as r:
        stages = json.load(r)

    print(f"\n== {qname}  build={t_build:.2f}s noop={t_noop:.2f}s "
          f"rebuild={t_rebuild:.2f}s renoop={t_renoop:.2f}s")
    from datetime import datetime

    def ts(s):
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")

    print("\n-- jobs (wall ≥ 0.15 s), chronological:")
    tot = 0.0
    for j in sorted(jobs, key=lambda j: j["jobId"]):
        if "completionTime" not in j or "submissionTime" not in j:
            continue
        dur = (ts(j["completionTime"]) - ts(j["submissionTime"])).total_seconds()
        tot += dur
        if dur >= 0.15:
            desc = (j.get("description") or j.get("name") or "")[:110]
            print(f"  job {j['jobId']:>4}  {dur:7.2f}s  {desc}")
    print(f"  (sum of ALL job walls: {tot:.2f}s — overlapped jobs double-count)")

    print("\n-- top 15 stages by executorRunTime:")
    for s in sorted(stages, key=lambda s: -s.get("executorRunTime", 0))[:15]:
        print(
            f"  stage {s['stageId']:>4}  run={s['executorRunTime']/1e3:7.2f}s"
            f" cpu={s.get('executorCpuTime',0)/1e9:7.2f}s"
            f" tasks={s['numCompleteTasks']:>3}"
            f" shW={s.get('shuffleWriteRecords',0):>9}"
            f" {(s.get('description') or s['name'])[:70]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
