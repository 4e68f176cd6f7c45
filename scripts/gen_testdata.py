#!/usr/bin/env python
"""Deterministic synthetic-table generator mirroring /root/testdata's
contract (TESTDATA.md: TPC-H-ish star schema + events/documents/
embeddings, seed=42) at scale factors the driver does not ship —
chiefly sf1, so the heavy operator family gets a measured sf0.1->sf1
slope instead of a plan-shape argument (SCALE.md).

Distributions were measured from the driver's sf0.01/sf0.1 tables and
reproduced shape-for-shape (row-count ratios, key cardinalities,
category sets and frequencies, value ranges, per-order lineitem
fan-out, 10-cluster unit-norm embeddings, ~0.2% exact-duplicate
documents). One deliberate r7 DEPARTURE from the driver's shape: the
document token stream is bounded-Zipf over a corpus-scaled vocabulary
(see the documents section below) instead of the driver's 31-type flat
salad, because a flat vocabulary cannot demonstrate any Zipf-tail
scale lever. Values will not match the driver's bit-for-bit — this
data is for BENCHMARKING slopes, not oracle parity; correctness stays
pinned at the driver's own sf0.01.

Usage: python scripts/gen_testdata.py SF OUTDIR   # e.g. 1 .localdata/sf1
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark batch line column order small sort fast value scan hash slow "
    "group agg filter query big key window row part table stream merge "
    "data a join shuffle plan cache skew"
).split()
assert len(VOCAB) == 31

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["LARGE", "STANDARD", "MEDIUM", "SMALL", "PROMO", "ECONOMY"]
ADJ = ["large", "hot", "blue", "red", "small", "green", "dim", "new"]
NOUN = ["ring", "bolt", "case", "box", "cap", "cell", "disk", "pin"]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]

DAY_US = 86_400_000_000  # microseconds


def _ts_array(us: np.ndarray) -> pa.Array:
    return pa.array(us.astype("int64"), type=pa.timestamp("us"))


def write(outdir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(outdir, f"{name}.parquet")
    pq.write_table(table, path)
    print(f"{name:12s} {table.num_rows:>10,} rows  {os.path.getsize(path):>12,} B")


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    sf = float(sys.argv[1])
    outdir = sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(42)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int64()),
        "r_name": REGIONS,
    }))
    write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int64()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int64()),
    }))
    write(outdir, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int64()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int64()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))
    pid = np.arange(n_part)
    write(outdir, "part", pa.table({
        "p_partkey": pa.array(pid, pa.int64()),
        "p_name": [f"{ADJ[i % 8]} {NOUN[(i // 8) % 8]}" for i in range(n_part)],
        "p_brand": pa.array([f"Brand#{i % 20 + 1}" for i in range(n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + (pid % 1000) * 0.1, 2),
    }))

    # orders span 1995-01-01 .. 2001-08-01 like the driver's
    epoch95 = np.datetime64("1995-01-01", "us").astype("int64")
    span_days = (np.datetime64("2001-08-01") - np.datetime64("1995-01-01")).astype(int)
    odate_day = rng.integers(0, span_days + 1, n_ord)
    okey = np.arange(n_ord)
    write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(okey, pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts_array(epoch95 + odate_day * DAY_US),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    # lineitem: Poisson(4) lines per order (driver sf0.1 shows mean ~4.08
    # with ~2% zero-line orders), shipdate = orderdate + U[1,120] days.
    # l_linenumber cycles 1..7 and is deliberately NOT unique per order:
    # the driver's own sf0.1 has 118k duplicate (l_orderkey,
    # l_linenumber) pairs (max linenumber 7 with up to 17 lines/order),
    # so the modulo mirrors the driver, not real TPC-H
    per_order = rng.poisson(4.0, n_ord)
    l_okey = np.repeat(okey, per_order)
    n_li = len(l_okey)
    l_odate_day = np.repeat(odate_day, per_order)
    linenum = np.concatenate([np.arange(c) % 7 + 1 for c in per_order if c]) if n_li else np.array([], dtype=int)
    qty = rng.integers(1, 51, n_li).astype("float64")
    write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_okey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900, 2100, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array(np.array(["R", "N", "A"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_array(epoch95 + (l_odate_day + rng.integers(1, 121, n_li)) * DAY_US),
    }))

    # events: one month, uniform types, per-user uniform
    epoch24 = np.datetime64("2024-01-01", "us").astype("int64")
    evt_us = rng.integers(0, 30 * DAY_US, n_evt)
    write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_evt), pa.int64()),
        "ts": _ts_array(epoch24 + evt_us),
        "user_id": pa.array(rng.integers(0, n_users, n_evt), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)]),
        "value": np.round(rng.uniform(0, 560, n_evt), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_evt)],
    }))

    # documents: 10-100-word texts whose tokens follow a bounded Zipf
    # (P(rank r) ∝ 1/r over a vocab that SCALES with the corpus,
    # V ≈ n_tokens/10 — the Heaps-law tail real corpora have). The head
    # 31 ranks map to the legacy flat vocabulary (so queries that pin
    # those words keep seeing them); rank r > 31 becomes "w{r}". This
    # replaced the r1-r6 31-type flat vocabulary, whose zero rare
    # tokens made every Zipf-tail lever (min_count co-occurrence
    # pruning, BPE merges, vocab coverage, bigram familiarity, hashed
    # classifier) unmeasurable: at V=n_tokens/10 and s=1, ~15% of token
    # INSTANCES and ~85% of distinct types sit below min_count=5, which
    # is what the pruned-vs-unpruned slope needs to mean something.
    # Dup structure is unchanged: ~2% near-duplicates of an earlier doc
    # (1-3 tokens swapped) and ~0.2% exact duplicates — what the dedup
    # family banks on.
    vocab = np.array(VOCAB)
    lens = rng.integers(10, 101, n_doc)
    total = int(lens.sum())
    V = int(max(1000, min(4_000_000, total // 10)))
    cdf = np.cumsum(1.0 / np.arange(1, V + 1, dtype="float64"))
    cdf /= cdf[-1]
    ranks = np.searchsorted(cdf, rng.random(total), side="left") + 1
    tok_pool = np.where(
        ranks <= 31,
        vocab[np.minimum(ranks, 31) - 1],
        np.char.add("w", ranks.astype("U7")),
    )
    swap_ranks = np.searchsorted(cdf, rng.random(n_doc * 3), side="left") + 1
    swap_pool = np.where(
        swap_ranks <= 31,
        vocab[np.minimum(swap_ranks, 31) - 1],
        np.char.add("w", swap_ranks.astype("U7")),
    )
    texts: list[str] = []
    pool_at = swap_at = 0
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.002:
            texts.append(texts[int(rng.integers(0, i))])
            continue
        if i > 10 and r < 0.022:
            base = texts[int(rng.integers(0, i))].split()
            for _ in range(int(rng.integers(1, 4))):
                base[int(rng.integers(0, len(base)))] = swap_pool[swap_at]
                swap_at += 1
            texts.append(" ".join(base))
            continue
        texts.append(" ".join(tok_pool[pool_at:pool_at + lens[i]]))
        pool_at += int(lens[i])
    write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: 10 unit-norm cluster centers + noise, re-normalized
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + rng.normal(scale=0.35, size=(n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype("float32")
    write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
