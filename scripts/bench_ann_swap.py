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
- "ivf" requires a codebook; training time is reported SEPARATELY as
  `train_secs` nested under the method entry, because at 100 TB the
  codebook is trained once on a sample and reused across runs — the
  steady-state number is the probe, the honest number for a cold start
  is train + probe.
- recall@k = |approx top-k pairs ∩ exact top-k pairs| / |exact top-k
  pairs| over all anchors (pair-level, rank-insensitive).

An untimed warmup (one exact run) precedes the first timed method so
JVM JIT / codegen / parquet-footer caches don't get billed to the exact
baseline (its r7 43.4-64.1 s spread was cold-start, inflating the
reported speedups).

--sweep replaces the three shipped-default methods with a recall-vs-
speed grid over (n_planes, n_probes) for LSH and (n_centroids, nprobe)
for IVF — single timed iteration per point (recall is deterministic;
re-time the chosen operating point without --sweep for the median-of-3
number).

Usage:
  python scripts/bench_ann_swap.py [sf_dir] [--json OUT.json] [--sweep]
Defaults: sf_dir=.localdata/sf1 (generate with
`python scripts/gen_testdata.py 1 .localdata/sf1`).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_ANCHORS = 100
K = 10
ITERS = 3

# recall-vs-speed grids for --sweep. LSH n_probes now extends past
# n_planes+1 into Hamming-2/3 probes (similarity._probe_masks); the
# fraction column in SCALE.md is n_probes / 2^n_planes.
LSH_GRID = [(8, 9), (8, 37), (6, 22), (5, 16), (4, 11)]
IVF_GRID = [(64, 8), (64, 16), (64, 24), (128, 16), (128, 32)]


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
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("sf_dir", nargs="?", default=os.path.join(ROOT, ".localdata/sf1"))
    ap.add_argument("--json", dest="out_json", default=None)
    ap.add_argument("--sweep", action="store_true")
    ns = ap.parse_args()
    sf_dir = ns.sf_dir
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

    iters = 1 if ns.sweep else ITERS
    result: dict = {
        "sf_dir": sf_dir,
        "n_corpus": n_corpus,
        "n_anchors": N_ANCHORS,
        "k": K,
        "iters": iters,
        "sweep": ns.sweep,
        "methods": {},
    }

    # untimed warmup: JIT/codegen/parquet-footer caches (matches bench.py)
    SIM.hard_negatives(emb, anchors, k=K).count()

    # exact — the recall-1.0 baseline and the ground truth for recall
    med, spread = timed(spark, lambda: SIM.hard_negatives(emb, anchors, k=K), iters)
    exact_pairs = pair_set(SIM.hard_negatives(emb, anchors, k=K))
    exact_secs = med
    result["methods"]["exact"] = {"secs": med, "spread": spread, "recall": 1.0}

    def record(key: str, build, extra: dict) -> None:
        med, spread = timed(spark, build, iters)
        pairs = pair_set(build())
        result["methods"][key] = {
            "secs": med,
            "spread": spread,
            "recall": round(len(pairs & exact_pairs) / len(exact_pairs), 4),
            "speedup_vs_exact": round(exact_secs / med, 2) if med else None,
            **extra,
        }
        print(json.dumps({key: result["methods"][key]}), flush=True)

    # non-sweep defaults = the r8 RECOMMENDED operating points (SCALE.md
    # 'ANN operating points'), so a plain run re-measures the shipped
    # configuration rather than the r7 low-recall one
    lsh_grid = LSH_GRID if ns.sweep else [(5, 16)]
    ivf_grid = IVF_GRID if ns.sweep else [(64, 24)]

    for n_planes, n_probes in lsh_grid:
        record(
            f"lsh_p{n_planes}_q{n_probes}" if ns.sweep else "lsh",
            lambda np_=n_planes, nq=n_probes: SIM.hard_negatives(
                emb, anchors, k=K, method="lsh", n_planes=np_, n_probes=nq
            ),
            {"n_planes": n_planes, "n_probes": n_probes,
             "frac_probed": round(n_probes / 2**n_planes, 4)},
        )

    codebooks: dict[int, tuple[list, float]] = {}
    for n_centroids, nprobe in ivf_grid:
        if n_centroids not in codebooks:
            t0 = time.time()
            cb = SIM.train_ivf_centroids(emb, n_centroids=n_centroids, iterations=3)
            codebooks[n_centroids] = (cb, round(time.time() - t0, 3))
        centroids, train_secs = codebooks[n_centroids]
        record(
            f"ivf_c{n_centroids}_n{nprobe}" if ns.sweep else "ivf",
            lambda c=centroids, n=nprobe: SIM.hard_negatives(
                emb, anchors, k=K, method="ivf", centroids=c, nprobe=n
            ),
            {"n_centroids": n_centroids, "nprobe": nprobe, "train_secs": train_secs,
             "frac_probed": round(nprobe / n_centroids, 4)},
        )

    print(json.dumps(result))
    if ns.out_json:
        with open(ns.out_json, "w") as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
