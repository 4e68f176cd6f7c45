#!/usr/bin/env python
"""Empirical profile of one parity query (guide §1/§7): runs it
iters times in a fresh JVM with the UI enabled, then dumps per-stage
wall / task counts / shuffle + spill bytes from the UI REST API,
sorted by stage wall time. This is the local stand-in for "open the
Stages tab, find where the time goes".

Usage: python scripts/profile_query.py <query> [iters]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from notion_spark import parity
    from notion_spark.session import BENCH_DRIVER_MEMORY_CONF, get_spark

    spark = get_spark(
        app_name=f"profile-{name}",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4555",
            "spark.ui.retainedStages": "5000",
            "spark.ui.retainedJobs": "2000",
            **BENCH_DRIVER_MEMORY_CONF,
        },
    )
    # warmup amortizes JVM/codegen startup out of the numbers (bench.py
    # methodology)
    parity.QUERIES["q1_pricing_summary"](spark, sf_dir).count()

    fn = parity.QUERIES[name]
    runs = []
    marks = []
    for i in range(iters):
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        time.sleep(0.3)
        spark.sparkContext.setJobDescription(f"{name} iter{i}")
        t0 = time.time()
        fn(spark, sf_dir).count()
        dt = time.time() - t0
        runs.append(dt)
        marks.append(t0)
    runs_sorted = sorted(runs)
    mid = len(runs_sorted) // 2
    med = (
        runs_sorted[mid]
        if len(runs_sorted) % 2
        else (runs_sorted[mid - 1] + runs_sorted[mid]) / 2
    )
    print(f"\n=== {name}: runs {[round(r, 2) for r in runs]} median {med:.2f}s ===")

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4555/api/v1/applications/{app_id}"

    def get(path):
        with urllib.request.urlopen(base + path) as r:
            return json.load(r)

    # restrict to stages of the LAST iteration (steady state)
    last_t0 = marks[-1] * 1000
    stages = [
        s
        for s in get("/stages?status=complete")
        if s.get("firstTaskLaunchedTime")
        and _ms(s["submissionTime"]) >= last_t0 - 500
    ]
    stages.sort(key=lambda s: -(s["executorRunTime"]))
    total_run = sum(s["executorRunTime"] for s in stages)
    print(f"last-iter stages: {len(stages)}, total executorRunTime {total_run/1000:.2f}s (sums across 32 threads)")
    print(f"{'stage':>6} {'wall_ms':>8} {'execRun_ms':>10} {'tasks':>6} {'in_MB':>8} {'shW_MB':>8} {'shR_MB':>8} {'spill_MB':>9}  name")
    for s in stages[:25]:
        wall = _ms(s["completionTime"]) - _ms(s["firstTaskLaunchedTime"])
        print(
            f"{s['stageId']:>6} {wall:>8.0f} {s['executorRunTime']:>10} {s['numCompleteTasks']:>6}"
            f" {s['inputBytes']/1e6:>8.2f} {s['shuffleWriteBytes']/1e6:>8.2f} {s['shuffleReadBytes']/1e6:>8.2f}"
            f" {s['memoryBytesSpilled']/1e6:>9.1f}  {s['name'][:70]}"
        )
    njobs = len([j for j in get("/jobs?status=succeeded") if j["submissionTime"] and _ms(j["submissionTime"]) >= last_t0 - 500])
    print(f"last-iter jobs: {njobs}")

    if os.environ.get("PROFILE_SQL", "1") != "0":
        # operator-level attribution: the SQL tab's node metrics for the
        # last execution (guide §7.1 — map stages back to operators)
        execs = get("/sql?length=200")
        execs = [e for e in execs if e["status"] == "COMPLETED"]
        if execs:
            last = max(execs, key=lambda e: e["id"])
            detail = get(f"/sql/{last['id']}")
            print(f"\nSQL execution {last['id']} nodes (duration-ish metrics only):")
            nodes = detail.get("nodes", [])
            for node in nodes:
                interesting = {
                    m["name"]: m["value"]
                    for m in node.get("metrics", [])
                    if any(
                        k in m["name"]
                        for k in (
                            "time total", "duration", "output rows", "spill",
                            "build time", "sort time", "shuffle bytes written",
                            "records read",
                        )
                    )
                }
                if interesting:
                    print(f"  [{node['nodeId']:>3}] {node['nodeName'][:45]:45} {interesting}")


def _ms(iso: str) -> float:
    # "2026-08-17T12:00:00.123GMT" -> epoch ms
    import datetime

    return (
        datetime.datetime.strptime(iso.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z").timestamp()
        * 1000
    )


if __name__ == "__main__":
    main()
