#!/usr/bin/env python
"""Containment-pairs recall study (VERDICT r11 ask #6, the
levenshtein-sweep method): measure where MinHash-LSH Jaccard banding
loses size-skewed containment pairs, as a TABLE instead of a docstring
caveat.

Two measurements at one sf_dir (default sf0.1 documents):

1. **Natural-corpus recall**: exact ground truth via the shingle
   inverted-index join (every pair sharing >= 1 shingle hash, exact
   intersection counts — complete for any containment threshold > 0),
   then recall of `containment_pairs` per band geometry against it.
2. **Planted-pair recall by size ratio**: deterministic containers
   built by concatenating corpus texts — small doc i's full text plus
   `ratio` other docs' texts — so the small side's containment is ~1.0
   by construction while the pair's JACCARD is ~1/(ratio+1). Recall
   per (geometry, ratio) is the documented fall-off, quantified.

Geometries swept: (num_hashes=64, bands in {16, 32, 64}) — r = 4
(the shipped default), 2, 1. The r=1 geometry is the containment
operating point: P(collide) = 1-(1-J)^64 stays high even at J ~ 0.03
(ratio 30), where r=4's J^4-per-band admission is ~0.

Usage: python scripts/measure_containment_recall.py [sf_dir] [--json OUT]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from notion_spark.pipeline.dedup import (  # noqa: E402
    containment_pairs,
    shingle_hash_sets,
)
from notion_spark.session import BENCH_DRIVER_MEMORY_CONF, get_spark  # noqa: E402
from notion_spark.sources.io import read_table  # noqa: E402

GEOMETRIES = [(64, 16), (64, 32), (64, 64)]
RATIOS = [1, 3, 10, 30]
PLANT_PER_RATIO = 100
THRESHOLD = 900_000


def exact_ground_truth(docs, spark):
    """Exact containment pairs via the shingle inverted index: complete
    for any positive threshold (a qualifying pair shares >= 90% of the
    smaller side's shingles, hence >= 1)."""
    sets = shingle_hash_sets(docs, "text", "doc_id", 3)
    inv = sets.select("id", F.explode("sh").alias("h"))
    a = inv.select(F.col("id").alias("id_a"), "h")
    b = inv.select(F.col("id").alias("id_b"), "h")
    inter = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    sizes = sets.select("id", F.size("sh").cast("long").alias("sz"))
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("size_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            (F.col("inter") * 1_000_000 >= THRESHOLD * F.col("size_a"))
            | (F.col("inter") * 1_000_000 >= THRESHOLD * F.col("size_b"))
        )
        .select("id_a", "id_b")
    )


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="containment-recall",
        extra_conf={"spark.ui.enabled": "false", **BENCH_DRIVER_MEMORY_CONF},
    )
    docs = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )

    # ---- planted containers (deterministic: ordered by doc_id) ----
    rows = docs.orderBy("doc_id").limit(5000).collect()
    texts = [r.text for r in rows]
    ids = [r.doc_id for r in rows]
    planted_rows = []
    planted_truth = {}  # (ratio) -> set of (small_id, container_id)
    cursor = PLANT_PER_RATIO  # fillers start past the smalls
    for ratio in RATIOS:
        pairs = set()
        for i in range(PLANT_PER_RATIO):
            small_id, small = ids[i], texts[i]
            filler = " ".join(
                texts[(cursor + j) % len(texts)] for j in range(ratio)
            )
            cursor += ratio
            cid = 10_000_000 + ratio * 10_000 + i
            planted_rows.append((cid, small + " " + filler))
            pairs.add((min(small_id, cid), max(small_id, cid)))
        planted_truth[ratio] = pairs
    planted_df = spark.createDataFrame(
        planted_rows, "doc_id long, text string"
    )
    corpus = docs.unionByName(planted_df)

    # ---- exact natural-corpus ground truth ----
    t0 = time.time()
    nat_truth = {
        (r.id_a, r.id_b) for r in exact_ground_truth(docs, spark).collect()
    }
    t_exact = round(time.time() - t0, 2)
    out = {
        "sf_dir": sf_dir,
        "threshold_micro": THRESHOLD,
        "natural_truth_pairs": len(nat_truth),
        "exact_ground_truth_secs": t_exact,
        "planted_per_ratio": PLANT_PER_RATIO,
        "geometries": {},
    }
    for num_hashes, bands in GEOMETRIES:
        key = f"b{bands}xr{num_hashes // bands}"
        # natural corpus
        t0 = time.time()
        found_nat = {
            (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
            for r in containment_pairs(
                docs, num_hashes=num_hashes, bands=bands,
                threshold_micro=THRESHOLD,
            ).collect()
        }
        t_nat = round(time.time() - t0, 2)
        # planted corpus
        t0 = time.time()
        found_pl = {
            (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
            for r in containment_pairs(
                corpus, num_hashes=num_hashes, bands=bands,
                threshold_micro=THRESHOLD,
            ).collect()
        }
        t_pl = round(time.time() - t0, 2)
        per_ratio = {}
        for ratio in RATIOS:
            truth = planted_truth[ratio]
            per_ratio[f"ratio_{ratio}"] = round(
                len(truth & found_pl) / len(truth), 4
            )
        out["geometries"][key] = {
            "natural_recall": round(
                len(nat_truth & found_nat) / max(1, len(nat_truth)), 4
            ),
            "natural_secs": t_nat,
            "planted_recall_by_ratio": per_ratio,
            "planted_secs": t_pl,
        }
        print(key, json.dumps(out["geometries"][key]), flush=True)
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(out, fh, indent=1)
    print(json.dumps({"natural_truth_pairs": len(nat_truth)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
