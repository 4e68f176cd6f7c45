"""Property-based tests (hypothesis) for operator invariants.

Deterministic profile (derandomize) and small example counts — each
example pays a Spark job, so these probe semantics, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.text(alphabet="abcd", min_size=1, max_size=2)
updates = st.lists(st.tuples(keys, st.integers(0, 100)), min_size=1, max_size=12)


@SETTINGS
@given(existing=updates, incoming=updates)
def test_keep_last_upsert_matches_dict_semantics(spark, existing, incoming):
    """Upsert == dict.update: incoming wins per key, others survive."""
    from notion_spark.operators.incremental import keep_last_upsert, latest_per_key

    # reduce each side to one row per key first (the operator's contract),
    # keeping the row with the highest value as "latest"
    def last_per_key(rows):
        d = {}
        for k, v in rows:
            d[k] = max(v, d.get(k, -1))
        return d

    e, i = last_per_key(existing), last_per_key(incoming)
    edf = latest_per_key(
        spark.createDataFrame(existing, "k string, v int"), "k", [F.desc("v")]
    )
    idf = latest_per_key(
        spark.createDataFrame(incoming, "k string, v int"), "k", [F.desc("v")]
    )
    got = {r.k: r.v for r in keep_last_upsert(edf, idf, "k").collect()}
    assert got == {**e, **i}


@SETTINGS
@given(s=st.text(max_size=120), width=st.integers(10, 80))
def test_truncate_text_length_bound(spark, s, width):
    from notion_spark.functions.text import truncate_text

    df = spark.createDataFrame([(s,)], "v string")
    out = df.select(truncate_text(F.col("v"), width).alias("o")).collect()[0].o
    assert len(out) <= max(width, len(s) if len(s) <= width else width)
    if len(s) <= width:
        assert out == s
    else:
        assert out.endswith("...") and len(out) == width


@SETTINGS
@given(
    docs=st.lists(
        st.tuples(st.integers(0, 50), st.text(alphabet="ab c", min_size=0, max_size=40)),
        min_size=2,
        max_size=6,
        unique_by=lambda t: t[0],
    )
)
def test_jaccard_pairs_bounds_and_symmetry(spark, docs):
    """0 <= jaccard <= 1; identical texts (with >=3 tokens) score 1."""
    from notion_spark.pipeline.dedup import jaccard_pairs

    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = jaccard_pairs(df, block_key=F.lit(1), threshold=0.0).collect()
    text_of = dict(docs)
    for r in pairs:
        assert 0.0 <= r.jaccard <= 1.0
        assert r.id_a < r.id_b
        if (
            text_of[r.id_a].split() == text_of[r.id_b].split()
            and len(text_of[r.id_a].split()) >= 3
        ):
            assert r.jaccard == 1.0


@SETTINGS
@given(
    tags=st.lists(
        st.text(alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"), max_size=12),
        max_size=4,
    ),
    name=st.text(alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"), max_size=40),
)
def test_csv_roundtrip_hostile_strings(spark, tmp_path_factory, tags, name):
    """Arrays and names survive the CSV dialect round trip for arbitrary
    unicode including quotes, newlines, and list-syntax characters."""
    from notion_spark.sources.io import export_tasks_csv, read_tasks_csv

    path = str(tmp_path_factory.mktemp("csvrt"))
    df = spark.createDataFrame(
        [("u1", name, tags)], "uid string, name string, active_tags array<string>"
    )
    export_tasks_csv(df, path)
    back = read_tasks_csv(spark, path).collect()[0]
    # Spark CSV writes empty string and null identically; normalize both sides
    assert (back.name or "") == (name or "")
    assert [t or "" for t in (back.active_tags or [])] == [t or "" for t in tags]
