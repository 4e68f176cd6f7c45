from __future__ import annotations

from pyspark.sql import functions as F

from notion_spark.pipeline import text_analysis as TA


def test_token_counts(spark):
    df = spark.createDataFrame([("hello  world foo",), ("",), ("one-two 3",)], ["text"])
    out = df.select(
        TA.ws_token_count("text").alias("ws"), TA.regex_token_count("text").alias("rx")
    ).collect()
    assert [r.ws for r in out] == [3, 0, 2]
    # 'one-two 3' -> one, -, two, 3
    assert out[2].rx == 4


def test_quality_features_and_score(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"), (2, "!!! ??? 123 456 !!!")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in TA.quality_score(df).collect()}
    assert out[1].stopword_ratio > 0.2 and out[1].punct_ratio == 0.0
    assert out[1].quality > out[2].quality
    assert 0.0 <= out[2].quality <= 1.0


def test_detect_language(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat and the dog"),
            (2, "el gato que vive en la casa de los perros"),
            (3, "xyzzy plugh"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.lang_pred for r in TA.detect_language(df).collect()}
    assert out[1] == "en" and out[2] == "es" and out[3] == "und"


def test_fingerprint_canonicalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello   world"), (3, "goodbye world")], ["doc_id", "text"]
    )
    out = {r.doc_id: r.fingerprint for r in TA.with_fingerprint(df).collect()}
    assert out[1] == out[2] != out[3]


def test_real_documents_table(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = TA.quality_score(docs)
    assert scored.filter(F.col("n_tokens") > 0).count() == docs.count()


def test_winnowing_fingerprints_detect_shared_runs(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (1, "intro words before " + shared + " trailing tail here"),
        (2, shared + " completely different ending text follows now"),
        (3, "nothing in common with the others at all whatsoever today"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = TA.winnowing_fingerprints(df, k=5, window=4)
    overlap = {(r.id_a, r.id_b): r.shared_fps for r in TA.fingerprint_overlap(fps).collect()}
    assert overlap.get((1, 2), 0) >= 1       # shared 10-token run -> shared fingerprints
    assert (1, 3) not in overlap and (2, 3) not in overlap
    # position-independence: the shared run sits at different offsets
    # determinism
    fps2 = TA.winnowing_fingerprints(df, k=5, window=4)
    assert sorted(map(tuple, fps.collect())) == sorted(map(tuple, fps2.collect()))


def test_bm25_topk_ranking(spark):
    from notion_spark.pipeline.text_analysis import bm25_topk

    docs = [
        (1, "rareword common common common"),          # has the rare term
        (2, "common common common common"),            # only the common term
        (3, "rareword rareword common filler filler"), # rare term twice
        (4, "filler words only nothing relevant"),     # no query terms
        (5, "common " + "pad " * 60),                  # long doc, one hit
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = bm25_topk(df, ["rareword", "common"], k=10)
    got = [r.id for r in rows.collect()]
    assert 4 not in got                       # zero-score docs excluded
    assert got[0] == 3                        # two rare hits outrank one
    assert got.index(1) < got.index(2)        # rare+common beats common-only
    assert got.index(2) < got.index(5)        # short doc beats long doc (length norm)
    r = {x.id: x for x in rows.collect()}
    assert r[3].tf_0 == 2 and r[3].tf_1 == 1 and r[1].tf_1 == 3
    # determinism: same frame, repartitioned, identical scores
    again = {x.id: x.score for x in bm25_topk(df.repartition(5), ["rareword", "common"], k=10).collect()}
    assert again == {x.id: x.score for x in rows.collect()}


class TestBuildVocabulary:
    def test_counts_ranks_and_coverage(self, spark):
        from notion_spark.pipeline.text_analysis import build_vocabulary

        df = spark.createDataFrame(
            [(1, "a a a b b c"), (2, "a b x")],
            "doc_id long, text string",
        )
        rows = {r.token: r for r in build_vocabulary(df).collect()}
        assert rows["a"].cnt == 4 and rows["a"].doc_freq == 2 and rows["a"].rank == 1
        assert rows["b"].cnt == 3 and rows["b"].rank == 2
        # tie between c and x (cnt=1) breaks by token asc
        assert rows["c"].rank == 3 and rows["x"].rank == 4
        # exact cumulative coverage of the WHOLE corpus: 4/9, 7/9, 8/9, 9/9
        assert rows["a"].cum_frac == 0.444444
        assert rows["b"].cum_frac == 0.777778
        assert rows["x"].cum_frac == 1.0

    def test_top_n_cut_keeps_whole_corpus_denominator(self, spark):
        from notion_spark.pipeline.text_analysis import build_vocabulary

        df = spark.createDataFrame(
            [(1, "a a a b b c")], "doc_id long, text string"
        )
        rows = build_vocabulary(df, top_n=1).collect()
        assert len(rows) == 1
        # head-only cut, corpus-wide denominator: 3/6 not 3/3
        assert rows[0].token == "a" and rows[0].cum_frac == 0.5

    def test_empty_tokens_and_null_text_excluded(self, spark):
        from notion_spark.pipeline.text_analysis import build_vocabulary

        df = spark.createDataFrame(
            [(1, "  a   b  "), (2, None)], "doc_id long, text string"
        )
        rows = {r.token: r for r in build_vocabulary(df).collect()}
        assert set(rows) == {"a", "b"}


class TestBpeMergeCandidates:
    def test_weighted_pairs_and_ranks(self, spark):
        from notion_spark.pipeline.text_analysis import bpe_merge_candidates

        vocab = spark.createDataFrame(
            [("low", 5), ("lower", 2), ("a", 9)], "token string, cnt long"
        )
        rows = bpe_merge_candidates(vocab, k=10).collect()
        got = {r.pair: (r.pair_count, r.rank) for r in rows}
        # 'lo','ow' in both words: 5+2=7; 'we','er' only in lower: 2
        assert got["lo"] == (7, 1) and got["ow"] == (7, 2)  # tie -> pair asc
        assert got["er"] == (2, 3) and got["we"] == (2, 4)
        assert "a" not in got  # single-char token emits nothing

    def test_k_cut(self, spark):
        from notion_spark.pipeline.text_analysis import bpe_merge_candidates

        vocab = spark.createDataFrame(
            [("abcdef", 1)], "token string, cnt long"
        )
        assert bpe_merge_candidates(vocab, k=2).count() == 2


class TestCooccurrenceCounts:
    def test_window_and_canonical_pairs(self, spark):
        from notion_spark.pipeline.text_analysis import cooccurrence_counts

        df = spark.createDataFrame(
            [(1, "a b c a"), (2, "c a")], "doc_id long, text string"
        )
        out = {(r.tok_a, r.tok_b): r.cnt for r in
               cooccurrence_counts(df, window=2, k=100).collect()}
        # doc1 pairs (w=2): (a,b),(a,c),(b,c),(b,a),(c,a); doc2: (c,a)
        # canonical: ab:2 (a-b and b-a), ac:3 (a-c, c-a, c-a doc2), bc:1
        assert out[("a", "b")] == 2
        assert out[("a", "c")] == 3
        assert out[("b", "c")] == 1

    def test_self_pairs_counted_for_repeats(self, spark):
        from notion_spark.pipeline.text_analysis import cooccurrence_counts

        df = spark.createDataFrame([(1, "x x x")], "doc_id long, text string")
        out = {(r.tok_a, r.tok_b): r.cnt for r in
               cooccurrence_counts(df, window=1, k=10).collect()}
        assert out[("x", "x")] == 2  # adjacent repeats co-occur

    def test_rank_and_k_cut(self, spark):
        from notion_spark.pipeline.text_analysis import cooccurrence_counts

        df = spark.createDataFrame([(1, "a b a b a")], "doc_id long, text string")
        rows = cooccurrence_counts(df, window=1, k=1).collect()
        assert len(rows) == 1 and rows[0].rank == 1
        assert (rows[0].tok_a, rows[0].tok_b, rows[0].cnt) == ("a", "b", 4)

    def test_bad_window_rejected(self, spark):
        import pytest

        from notion_spark.pipeline.text_analysis import cooccurrence_counts

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError, match="window"):
            cooccurrence_counts(df, window=0)

    def test_min_count_prune_is_a_filter_of_the_unpruned_table(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from notion_spark.pipeline.text_analysis import cooccurrence_counts, ws_tokens

        df = spark.read.parquet(f"{sf_dir}/documents.parquet")
        full = cooccurrence_counts(df, window=3, k=10**6).drop("rank")
        pruned = cooccurrence_counts(df, window=3, k=10**6, min_count=3).drop("rank")
        counts = {
            r.tok: r.c
            for r in df.filter(F.col("text").isNotNull())
            .select(F.explode(ws_tokens(F.col("text"))).alias("tok"))
            .groupBy("tok").agg(F.count(F.lit(1)).alias("c")).collect()
        }
        expect = sorted(
            (r.tok_a, r.tok_b, r.cnt)
            for r in full.collect()
            if counts[r.tok_a] >= 3 and counts[r.tok_b] >= 3
        )
        got = sorted((r.tok_a, r.tok_b, r.cnt) for r in pruned.collect())
        # surviving pairs keep EXACT unpruned counts; only rare-token
        # pairs disappear (at tiny SF the vocab may have no rare tokens
        # at all, in which case the tables are identical)
        assert got == expect and len(got) <= full.count()

    def test_min_count_gap_positions_not_rebased(self, spark):
        from notion_spark.pipeline.text_analysis import cooccurrence_counts

        # 'rare' appears once and sits BETWEEN a and b: pruning it must
        # not shrink the a<->b distance (positions are original), so at
        # window=1 the (a, b) pair must NOT appear after the prune
        df = spark.createDataFrame(
            [(1, "a rare b c a c b")], "doc_id long, text string"
        )
        out = {(r.tok_a, r.tok_b): r.cnt for r in
               cooccurrence_counts(df, window=1, k=100, min_count=2).collect()}
        assert ("a", "b") not in out  # only adjacency via the pruned gap
        assert out[("a", "c")] == 2 and out[("b", "c")] == 2


class TestTokenRunStats:
    def test_runs_and_loop_fraction(self, spark):
        from notion_spark.pipeline.text_analysis import token_run_stats

        df = spark.createDataFrame(
            [
                (1, "go go go stop go"),          # run of 3 at min_run=3
                (2, "a b a b a b"),               # alternation: no runs
                (3, "x x y y y y z"),             # runs 2 and 4
                (4, None),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in token_run_stats(df, min_run=3).collect()}
        assert set(out) == {1, 2, 3}
        assert (out[1].n_tokens, out[1].max_run, out[1].n_loop_tokens) == (5, 3, 3)
        assert out[1].loop_frac == 0.6
        assert (out[2].max_run, out[2].n_loop_tokens, out[2].loop_frac) == (1, 0, 0.0)
        assert (out[3].n_tokens, out[3].max_run, out[3].n_loop_tokens) == (7, 4, 4)
        # 4/7 half-up = 0.571429
        assert out[3].loop_frac == 0.571429

    def test_single_doc_shuffle_key(self, spark):
        from notion_spark.pipeline.text_analysis import token_run_stats

        df = spark.createDataFrame([(1, "a a a")], "doc_id long, text string")
        plan = token_run_stats(df)._jdf.queryExecution().executedPlan().toString()
        # both stacked windows share the doc-keyed sort; no extra
        # (id, tok)-keyed exchange sneaks in
        assert plan.count("Window") <= 2


def test_bpe_encode_stats_chained_merges_and_single_pass(spark):
    """Merge rules apply in priority order and chain across priorities
    ("a"+"r" then "ar"+"k" turns spark into [sp? no — s p ark]); the
    documented single-pass boundary case: "arar" under rule (a,r)
    yields 3 units, not exhaustive-BPE's 2."""
    from notion_spark.pipeline.text_analysis import bpe_encode_stats

    df = spark.createDataFrame(
        [(1, "spark"), (2, "arar"), (3, "shine"), (4, "a")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_tokens, r.n_subwords) for r in bpe_encode_stats(df).collect()}
    # spark: s p a r k -> (a,r) -> s p ar k -> (ar,k) -> s p ark = 3
    assert got[1] == (1, 3)
    # arar: a r a r -> first ' a r ' merges, shared boundary blocks the
    # second in the same pass -> ar a r = 3
    assert got[2] == (1, 3)
    # shine: s h i n e -> (i,n) -> s h in e -> (s,h) -> sh in e
    #        -> (in,e) -> sh ine = 2
    assert got[3] == (1, 2)
    # single char: no merge applies
    assert got[4] == (1, 1)


def test_token_diversity_exact_fractions(spark):
    from notion_spark.pipeline.text_analysis import token_diversity

    rows = [
        ("a", "x x x x"),          # one type: gini 0, share 1
        ("b", "p q r s"),          # uniform 4: gini 1-4/16=0.75
        ("c", "w w w z"),          # 1-(9+1)/16 = 0.375, share 3/4
        ("d", ""),                 # empty
        ("e", None),               # null
        ("f", "   "),              # whitespace only
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_types, r.gini_micro, r.top_share_micro)
        for r in token_diversity(df).collect()
    }
    assert got == {
        "a": (4, 1, 0, 1000000),
        "b": (4, 4, 750000, 250000),
        "c": (4, 2, 375000, 750000),
        "d": (0, 0, 0, 0),
        "e": (0, 0, 0, 0),
        "f": (0, 0, 0, 0),
    }


def test_token_diversity_halfup_rounding(spark):
    from fractions import Fraction

    from notion_spark.pipeline.text_analysis import token_diversity

    # 3 tokens, counts (2,1): gini = 1-5/9 = 4/9 -> 444444.44.. rounds
    # half-up to 444444; share 2/3 -> 666666.66.. -> 666667
    df = spark.createDataFrame([("a", "t t u")], "doc_id string, text string")
    r = token_diversity(df).collect()[0]
    def half_up(fr):
        return (2 * fr.numerator * 10**6 + fr.denominator) // (2 * fr.denominator)
    assert r.gini_micro == half_up(Fraction(4, 9)) == 444444
    assert r.top_share_micro == half_up(Fraction(2, 3)) == 666667


class TestReadabilityScores:
    def _d(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_known_counts_and_score(self, spark):
        from notion_spark.pipeline.text_analysis import readability_scores

        out = readability_scores(
            self._d(spark, [(1, "The cat sat. The dog ran!")])
        ).collect()[0]
        assert (out.words, out.sentences, out.syllables) == (6, 2, 6)
        # 206835000 - 1015000*6/2 - 84600000*6/6, all divisions exact
        assert out.flesch_micro == 206835000 - 3045000 - 84600000
        assert out.band == "very_easy"

    def test_clamps_no_punct_and_vowelless(self, spark):
        from notion_spark.pipeline.text_analysis import readability_scores

        out = readability_scores(self._d(spark, [(1, "7 xyz")])).collect()[0]
        assert out.sentences == 1            # no terminator -> one sentence
        assert out.syllables == out.words == 2   # vowel-less words clamp up

    def test_syllable_heavy_text_lands_hard_band(self, spark):
        from notion_spark.pipeline.text_analysis import readability_scores

        out = readability_scores(self._d(spark, [(1, "banana banana")])).collect()[0]
        assert out.syllables == 6 and out.flesch_micro < 0
        assert out.band == "very_confusing"

    def test_null_text_excluded_no_shuffle(self, spark):
        from notion_spark.pipeline.text_analysis import readability_scores

        df = self._d(spark, [(1, "a."), (2, None)])
        out = readability_scores(df)
        assert out.count() == 1
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan
