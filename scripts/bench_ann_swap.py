#!/usr/bin/env python
"""Measure the executable ANN candidate-generation swap (r6) at scale:
`similarity.hard_negatives` with method="exact" vs "lsh" vs "ivf" on the
same anchors/corpus, reporting wall-clock (median of 3, bench.py's
isolation barrier) AND recall@k against the exact result — the number
that turns the r6 design claim ("the scale lever is shrinking the
CANDIDATE set") into a measured trade.

Method notes, for reading the artifact honestly:
- "exact" is the recall-1.0 baseline: broadcast anchors × full corpus.
  Its per-anchor cost grows linearly with |corpus|.
- "lsh" hashes the corpus once into 2^n_planes sign-LSH buckets and
  scores each anchor only against its multi-probe buckets. No training.
- "ivf" requires a codebook; training time is reported SEPARATELY
  (`ivf_train_secs`) because at 100 TB the codebook is trained once on
  a sample and reused across runs — the steady-state number is the
  probe, the honest number for a cold start is train + probe.
- recall@k = |approx top-k pairs ∩ exact top-k pairs| / |exact top-k
  pairs| over all anchors (pair-level, rank-insensitive).

Usage: python scripts/bench_ann_swap.py [sf_dir] [--json OUT.json]
Defaults: sf_dir=.localdata/sf1 (generate with
`python scripts/gen_testdata.py 1 .localdata/sf1`).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_ANCHORS = 100
K = 10
ITERS = 3


def barrier(spark) -> None:
    spark.catalog.clearCache()
    spark._jvm.System.gc()
    time.sleep(0.3)


def timed(spark, build, iters: int = ITERS) -> tuple[float, list[float]]:
    runs = []
    barrier(spark)
    for _ in range(iters):
        t0 = time.time()
        build().count()
        runs.append(round(time.time() - t0, 3))
    runs.sort()
    mid = len(runs) // 2
    med = runs[mid] if len(runs) % 2 else (runs[mid - 1] + runs[mid]) / 2
    return round(med, 3), [runs[0], runs[-1]]


def pair_set(df) -> set[tuple[int, int]]:
    return {(r["query_id"], r["vec_id"]) for r in df.select("query_id", "vec_id").collect()}


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.path.join(ROOT, ".localdata/sf1")
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]
    if not os.path.isdir(sf_dir):
        print(f"{sf_dir} missing — generate with: python scripts/gen_testdata.py 1 {sf_dir}")
        return 2

    from pyspark.sql import functions as F

    from notion_spark.pipeline import similarity as SIM
    from notion_spark.session import BENCH_DRIVER_MEMORY_CONF, get_spark

    spark = get_spark(
        app_name="notion-spark-ann-swap",
        extra_conf={"spark.ui.enabled": "false", **BENCH_DRIVER_MEMORY_CONF},
    )
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_corpus = emb.count()
    anchors = emb.filter(F.col("vec_id") < N_ANCHORS).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )

    result: dict = {
        "sf_dir": sf_dir,
        "n_corpus": n_corpus,
        "n_anchors": N_ANCHORS,
        "k": K,
        "iters": ITERS,
        "methods": {},
    }

    # exact — the recall-1.0 baseline and the ground truth for recall
    med, spread = timed(spark, lambda: SIM.hard_negatives(emb, anchors, k=K))
    exact_pairs = pair_set(SIM.hard_negatives(emb, anchors, k=K))
    result["methods"]["exact"] = {"secs": med, "spread": spread, "recall": 1.0}

    # lsh — corpus hashed once per run; multi-probe on the anchor side
    def lsh_df():
        return SIM.hard_negatives(emb, anchors, k=K, method="lsh", n_planes=8, n_probes=2)

    med, spread = timed(spark, lsh_df)
    lsh_pairs = pair_set(lsh_df())
    result["methods"]["lsh"] = {
        "secs": med,
        "spread": spread,
        "n_planes": 8,
        "n_probes": 2,
        "recall": round(len(lsh_pairs & exact_pairs) / len(exact_pairs), 4),
    }

    # ivf — codebook trained once (timed separately: amortized at scale)
    t0 = time.time()
    centroids = SIM.train_ivf_centroids(emb, n_centroids=16, iterations=3)
    ivf_train_secs = round(time.time() - t0, 3)

    def ivf_df():
        return SIM.hard_negatives(emb, anchors, k=K, method="ivf", centroids=centroids, nprobe=2)

    med, spread = timed(spark, ivf_df)
    ivf_pairs = pair_set(ivf_df())
    result["methods"]["ivf"] = {
        "secs": med,
        "spread": spread,
        "n_centroids": 16,
        "nprobe": 2,
        "train_secs": ivf_train_secs,
        "recall": round(len(ivf_pairs & exact_pairs) / len(exact_pairs), 4),
    }

    print(json.dumps(result))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
