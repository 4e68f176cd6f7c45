#!/usr/bin/env python
"""Isolated before/after measurement of the r11 global_ranked swap
(VERDICT r11 ask #2): fresh-JVM median-of-3 rows for every
distributed-rank consumer, under three plan variants:

  r10   repartitionByRange + spark_partition_id offsets — the plan the
        r11 swap REPLACED. Correctness caveat: this plan silently
        corrupts ranks on an AQE exchange-reuse miss (measured r11:
        14851/20000 wrong with spark.sql.exchange.reuse=false); it is
        reconstructed HERE ONLY to price the swap, timed under default
        reuse=true where it happens to be right.
  r11   the shipped sampler-free arithmetic-bucket plan (stats.py).
  ckpt  r11 + eager localCheckpoint of the bucketed frame — the
        basket_lift precedent: pays one materialization to stop the
        bounds/local/totals branches (and any multi-reference
        consumer) from re-running the base lineage.

Usage:
  python scripts/measure_global_ranked.py [--json OUT] [sf_dir ...]
  python scripts/measure_global_ranked.py --worker VARIANT SF_DIR Q...

Main mode spawns one subprocess (fresh JVM) per (variant, sf_dir) so
every row is an isolated measurement, same methodology as bench.py's
chunked mode.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CONSUMERS = [
    "profile_gini_customer_revenue",
    "stats_mann_whitney_events",
    "stats_auc_doc_length",
    "stats_ks_test_events",
    "stats_rank_normalize_prices",
    "profile_pareto_customers",
    "curation_curriculum",
]


def _r10_global_ranked(df, order_cols, sum_cols=(), num_partitions=None,
                       rank_col="rank"):
    """Reconstruction of the pre-r11 ranged-pid plan, for pricing only
    (NOT correct under exchange-reuse misses — see module docstring)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from notion_spark.functions.exactmath import D38

    n = num_partitions or 32
    ranged = df.repartitionByRange(n, *[F.asc(c) for c in order_cols])
    withpid = ranged.withColumn("__pid", F.spark_partition_id())
    wl = Window.partitionBy("__pid").orderBy(*[F.asc(c) for c in order_cols])
    local = withpid.withColumn("__lrn", F.row_number().over(wl))
    for c in sum_cols:
        local = local.withColumn(
            f"__lrun_{c}",
            F.sum(F.col(c).cast(D38)).over(
                wl.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    per_p = [F.count(F.lit(1)).cast(D38).alias("__pcnt")] + [
        F.sum(F.col(c).cast(D38)).cast(D38).alias(f"__psum_{c}")
        for c in sum_cols
    ]
    totals = withpid.groupBy("__pid").agg(*per_p)
    wo = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        F.coalesce(F.sum("__pcnt").over(wo), F.lit(0).cast(D38)).alias(
            "__off_cnt"
        ),
        *[
            F.coalesce(F.sum(f"__psum_{c}").over(wo), F.lit(0).cast(D38))
            .alias(f"__off_{c}")
            for c in sum_cols
        ],
    )
    out = local.join(F.broadcast(offsets), "__pid").withColumn(
        rank_col, (F.col("__off_cnt") + F.col("__lrn")).cast("long")
    )
    for c in sum_cols:
        out = out.withColumn(
            f"run_{c}", (F.col(f"__off_{c}") + F.col(f"__lrun_{c}")).cast(D38)
        )
    drop = ["__pid", "__lrn", "__off_cnt"] + [
        x for c in sum_cols for x in (f"__lrun_{c}", f"__off_{c}")
    ]
    return out.drop(*drop)


def _ckpt_global_ranked(df, order_cols, sum_cols=(), num_partitions=None,
                        rank_col="rank"):
    """r11 plan + eager localCheckpoint of the bucketed frame."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from notion_spark.functions.exactmath import D38

    if not order_cols:
        raise ValueError("global_ranked: order_cols must be non-empty")
    n_buckets = 4096
    first = order_cols[0]
    base = df.withColumn("__gv", F.col(first).cast(D38))
    bounds = base.agg(
        F.min("__gv").alias("__glo"), F.max("__gv").alias("__ghi")
    ).select(
        "__glo",
        F.greatest(
            (F.col("__ghi") - F.col("__glo") + n_buckets) / n_buckets,
            F.lit(1),
        )
        .cast(D38)
        .alias("__gwidth"),
    )
    bucketed = (
        base.crossJoin(F.broadcast(bounds))
        .withColumn(
            "__b",
            F.when(F.col("__gv").isNull(), F.lit(-1)).otherwise(
                F.expr("CAST((__gv - __glo) div __gwidth AS INT)")
            ),
        )
        .drop("__gv", "__glo", "__gwidth")
    ).localCheckpoint(eager=True)
    wl = Window.partitionBy("__b").orderBy(*[F.asc(c) for c in order_cols])
    local = bucketed.withColumn("__lrn", F.row_number().over(wl))
    for c in sum_cols:
        local = local.withColumn(
            f"__lrun_{c}",
            F.sum(F.col(c).cast(D38)).over(
                wl.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    per_b = [F.count(F.lit(1)).cast(D38).alias("__pcnt")] + [
        F.sum(F.col(c).cast(D38)).cast(D38).alias(f"__psum_{c}")
        for c in sum_cols
    ]
    totals = bucketed.groupBy("__b").agg(*per_b)
    wo = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__b",
        F.coalesce(F.sum("__pcnt").over(wo), F.lit(0).cast(D38)).alias(
            "__off_cnt"
        ),
        *[
            F.coalesce(F.sum(f"__psum_{c}").over(wo), F.lit(0).cast(D38))
            .alias(f"__off_{c}")
            for c in sum_cols
        ],
    )
    out = local.join(F.broadcast(offsets), "__b").withColumn(
        rank_col, (F.col("__off_cnt") + F.col("__lrn")).cast("long")
    )
    for c in sum_cols:
        out = out.withColumn(
            f"run_{c}", (F.col(f"__off_{c}") + F.col(f"__lrun_{c}")).cast(D38)
        )
    drop = ["__b", "__lrn", "__off_cnt"] + [
        x for c in sum_cols for x in (f"__lrun_{c}", f"__off_{c}")
    ]
    return out.drop(*drop)


def _dbl_global_ranked(df, order_cols, sum_cols=(), num_partitions=None,
                       rank_col="rank"):
    """r11 plan with the bucket id computed in DOUBLE: conversion of
    the first key to double is weakly monotone (rounding preserves
    order), subtraction/division by broadcast constants and floor are
    monotone, and the whole expression is a pure deterministic IEEE
    row function — so buckets stay order-preserving and branch-safe,
    while the per-row DECIMAL(38,0) subtract/div leaves the hot path."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from notion_spark.functions.exactmath import D38

    if not order_cols:
        raise ValueError("global_ranked: order_cols must be non-empty")
    n_buckets = 4096
    first = order_cols[0]
    base = df.withColumn("__gv", F.col(first).cast("double"))
    bounds = base.agg(
        F.min("__gv").alias("__glo"), F.max("__gv").alias("__ghi")
    ).select(
        "__glo",
        F.greatest(
            (F.col("__ghi") - F.col("__glo") + n_buckets) / n_buckets,
            F.lit(1.0),
        ).alias("__gwidth"),
    )
    bucketed = (
        base.crossJoin(F.broadcast(bounds))
        .withColumn(
            "__b",
            F.when(F.col("__gv").isNull(), F.lit(-1)).otherwise(
                F.floor((F.col("__gv") - F.col("__glo")) / F.col("__gwidth"))
                .cast("int")
            ),
        )
        .drop("__gv", "__glo", "__gwidth")
    )
    wl = Window.partitionBy("__b").orderBy(*[F.asc(c) for c in order_cols])
    local = bucketed.withColumn("__lrn", F.row_number().over(wl))
    for c in sum_cols:
        local = local.withColumn(
            f"__lrun_{c}",
            F.sum(F.col(c).cast(D38)).over(
                wl.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    per_b = [F.count(F.lit(1)).cast(D38).alias("__pcnt")] + [
        F.sum(F.col(c).cast(D38)).cast(D38).alias(f"__psum_{c}")
        for c in sum_cols
    ]
    totals = bucketed.groupBy("__b").agg(*per_b)
    wo = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__b",
        F.coalesce(F.sum("__pcnt").over(wo), F.lit(0).cast(D38)).alias(
            "__off_cnt"
        ),
        *[
            F.coalesce(F.sum(f"__psum_{c}").over(wo), F.lit(0).cast(D38))
            .alias(f"__off_{c}")
            for c in sum_cols
        ],
    )
    out = local.join(F.broadcast(offsets), "__b").withColumn(
        rank_col, (F.col("__off_cnt") + F.col("__lrn")).cast("long")
    )
    for c in sum_cols:
        out = out.withColumn(
            f"run_{c}", (F.col(f"__off_{c}") + F.col(f"__lrun_{c}")).cast(D38)
        )
    drop = ["__b", "__lrn", "__off_cnt"] + [
        x for c in sum_cols for x in (f"__lrun_{c}", f"__off_{c}")
    ]
    return out.drop(*drop)


def worker(variant: str, sf_dir: str, queries: list[str]) -> None:
    import notion_spark.pipeline.stats as stats_mod
    from notion_spark import parity
    from notion_spark.session import BENCH_DRIVER_MEMORY_CONF, get_spark

    if variant == "r10":
        stats_mod.global_ranked = _r10_global_ranked
    elif variant == "ckpt":
        stats_mod.global_ranked = _ckpt_global_ranked
    elif variant == "dbl":
        stats_mod.global_ranked = _dbl_global_ranked
    elif variant != "r11":
        raise SystemExit(f"unknown variant {variant}")

    spark = get_spark(
        app_name=f"measure-global-ranked-{variant}",
        extra_conf={"spark.ui.enabled": "false", **BENCH_DRIVER_MEMORY_CONF},
    )
    parity.QUERIES["q1_pricing_summary"](spark, sf_dir).count()  # warmup
    times: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in queries:
        fn = parity.QUERIES[name]
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        time.sleep(0.3)
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
        runs.sort()
        times[name] = runs[1]
        spread[name] = [runs[0], runs[-1]]
    print(json.dumps({"variant": variant, "sf_dir": sf_dir,
                      "times": times, "spread": spread}))


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--worker":
        worker(argv[1], argv[2], argv[3:])
        return 0
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dirs = argv or ["/root/testdata/sf0.1"]
    results = []
    for sf_dir in sf_dirs:
        for variant in ("r10", "r11", "ckpt"):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 variant, sf_dir, *CONSUMERS],
                capture_output=True, text=True, cwd=ROOT,
            )
            lines = [ln for ln in proc.stdout.splitlines()
                     if ln.startswith("{")]
            if proc.returncode != 0 or not lines:
                sys.stderr.write(proc.stderr[-3000:])
                raise SystemExit(f"worker {variant}@{sf_dir} failed")
            row = json.loads(lines[-1])
            results.append(row)
            print(f"{variant}@{sf_dir}: "
                  + " ".join(f"{k}={v}" for k, v in row["times"].items()),
                  flush=True)
    out = {"methodology": "fresh JVM per (variant, sf); median of 3; "
                          "same barrier as bench.py", "rows": results}
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
