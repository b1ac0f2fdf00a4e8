"""Tests for chunking, TF-IDF, bigram PMI, C4 filters and
temperature resampling (the round-4 corpus-statistics additions)."""

import pytest
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.chunking import chunk_documents
from smartbots_etl_facturas_spark.operators.sampling import temperature_resample
from smartbots_etl_facturas_spark.operators.textstats import bigram_pmi, tfidf_top_terms
from smartbots_etl_facturas_spark.functions.text import c4_filter_flags


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b c d e f g h i j k l m n o p q r s t u v w x y z aa bb cc dd ee ff gg hh"),
        (2, "short doc"),
        (3, "x"),
        (4, "repeat token repeat token repeat token repeat token repeat token"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestChunking:
    def test_coverage_and_overlap(self, spark, docs):
        out = chunk_documents(docs, chunk_tokens=8, stride=6).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        # doc 1 has 34 tokens: starts 1,7,13,19,25,31 (<= 34-2=32)
        d1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
        assert [r.chunk_idx for r in d1] == [0, 1, 2, 3, 4, 5]
        # every token of the source appears in >= 1 chunk, in order
        toks = docs.filter("doc_id = 1").select(
            F.split(F.trim("text"), r"\s+").alias("t")
        ).head().t
        covered = set()
        for r in d1:
            piece = r.chunk_text.split(" ")
            start = int(r.chunk_idx) * 6
            assert piece == toks[start:start + 8]
            covered.update(range(start, start + len(piece)))
        assert covered == set(range(len(toks)))
        # consecutive chunks overlap by chunk - stride = 2 tokens
        for a, b in zip(d1, d1[1:]):
            assert a.chunk_text.split(" ")[-2:] == b.chunk_text.split(" ")[:2]

    def test_short_doc_single_chunk(self, spark, docs):
        out = chunk_documents(docs, chunk_tokens=8, stride=6)
        short = out.filter("doc_id = 3").collect()
        assert len(short) == 1
        assert short[0].chunk_text == "x"
        assert short[0].n_chunk_tokens == 1

    def test_bad_stride_rejected(self, docs):
        with pytest.raises(ValueError):
            chunk_documents(docs, chunk_tokens=4, stride=5)
        with pytest.raises(ValueError):
            chunk_documents(docs, chunk_tokens=4, stride=0)


class TestTfIdf:
    def test_rare_term_outranks_common(self, spark):
        rows = [
            (1, "common common common rare"),
            (2, "common filler words here"),
            (3, "common other stuff too"),
        ]
        d = spark.createDataFrame(rows, ["doc_id", "text"])
        out = tfidf_top_terms(d, k=1).collect()
        top = {r.doc_id: r.term for r in out}
        # 'rare' (tf=1, df=1 -> 1.0) beats 'common' (tf=3, df=3 -> 1.0)?
        # tie at 1.0 broken by term text: 'common' < 'rare'... so doc 1
        # top is 'common' ONLY on a tie; here common tf=3/df=3=1.0 and
        # rare 1/1=1.0 -> tie -> 'common'. Make rare tf=2 to dominate.
        rows2 = [(1, "common common rare rare rare")] + rows[1:]
        d2 = spark.createDataFrame(rows2, ["doc_id", "text"])
        out2 = {r.doc_id: r.term for r in tfidf_top_terms(d2, k=1).collect()}
        assert out2[1] == "rare"
        assert top[2] in ("filler", "here", "words")  # df=1 singletons tie

    def test_rank_is_total_order(self, spark, docs):
        out = tfidf_top_terms(docs, k=3)
        per_doc = out.groupBy("doc_id").agg(
            F.count("*").alias("n"), F.countDistinct("rank").alias("d")
        ).collect()
        for r in per_doc:
            assert r.n == r.d <= 3


class TestBigramPmi:
    def test_collocated_pair_ranks_first(self, spark):
        # 'new york' always adjacent; fillers independent
        rows = [(i, "new york " + ("blah foo " * 5)) for i in range(10)]
        d = spark.createDataFrame(rows, ["doc_id", "text"])
        out = bigram_pmi(d, min_count=5, top=5).collect()
        assert out[0].w1 == "new" and out[0].w2 == "york"
        assert out[0].lift > 1.0

    def test_min_count_filters(self, spark, docs):
        out = bigram_pmi(docs, min_count=100, top=10).collect()
        assert out == []


class TestC4Filters:
    def test_flags(self, spark):
        rows = [
            (1, " ".join(["word"] * 50)),          # pass both
            (2, " ".join(["word"] * 10)),          # too short
            (3, " ".join(["supercalifragilistic"] * 50)),  # mean len 20
        ]
        d = spark.createDataFrame(rows, ["doc_id", "text"]).select(
            "doc_id", F.split(F.trim("text"), r"\s+").alias("w")
        )
        fl = c4_filter_flags("w")
        got = {r.doc_id: r for r in d.select("doc_id", fl.alias("f")).select(
            "doc_id", "f.*").collect()}
        assert got[1].keep and got[1].words_ok and got[1].mean_len_ok
        assert not got[2].words_ok and got[2].mean_len_ok
        assert got[3].words_ok and not got[3].mean_len_ok and not got[3].keep
        assert got[3].mean_word_len == 20.0


class TestTemperatureResample:
    def test_partition_invariant_membership(self, spark, sf_dir):
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = temperature_resample(d, target_frac=0.5)
        b = temperature_resample(d.repartition(13, "doc_id"), target_frac=0.5)
        ids_a = sorted(r.doc_id for r in a.select("doc_id").collect())
        ids_b = sorted(r.doc_id for r in b.select("doc_id").collect())
        assert ids_a == ids_b and len(ids_a) > 0

    def test_flattens_shares(self, spark):
        # 400 docs from 'big', 100 from 'small': raw share 4:1,
        # sqrt-flattened 2:1 -> the small source's unclamped
        # acceptance rate is sqrt(400/100) = 2x the big source's.
        rows = [(i, "big") for i in range(400)] + [
            (1000 + i, "small") for i in range(100)]
        d = spark.createDataFrame(rows, ["doc_id", "source"])
        kept = temperature_resample(d, id_col="doc_id", target_frac=0.5)
        probs = {r.source: r.accept_prob
                 for r in kept.select("source", "accept_prob").distinct().collect()}
        assert probs["small"] < 1.0  # unclamped configuration
        assert probs["small"] / probs["big"] == pytest.approx(2.0, rel=1e-6)


class TestSimilarityJoin:
    def test_exact_vs_bruteforce(self, spark):
        from smartbots_etl_facturas_spark.operators.linkage import (
            jaccard_similarity_join,
        )

        rows_l = [(1, ["a", "b", "c", "d"]), (2, ["x", "y"]), (3, ["p"])]
        rows_r = [(10, ["a", "b", "c", "e"]),   # J with 1 = 3/5 = 0.6
                  (11, ["x", "y"]),             # J with 2 = 1.0
                  (12, ["q"])]                  # matches nothing
        l = spark.createDataFrame(rows_l, "doc_id long, toks array<string>")
        r = spark.createDataFrame(rows_r, "doc_id long, toks array<string>")
        got = {(x.left_id, x.right_id): x.jaccard
               for x in jaccard_similarity_join(l, r, 0.6).collect()}
        assert got == {(1, 10): 0.6, (2, 11): 1.0}
        # raising tau drops the 0.6 pair
        got2 = {(x.left_id, x.right_id)
                for x in jaccard_similarity_join(l, r, 0.61).collect()}
        assert got2 == {(2, 11)}

    def test_prefix_filter_is_lossless(self, spark, sf_dir):
        """Candidates after prefix filtering must contain EVERY pair a
        brute-force scan finds at the threshold (the PPJoin lossless
        property), on real corpus data."""
        from smartbots_etl_facturas_spark.operators.linkage import (
            jaccard_similarity_join,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", F.split(F.trim("text"), r"\s+").alias("toks")
        ).filter(F.col("doc_id") % 10 == 0)
        l = docs.filter(F.col("doc_id") % 20 == 0)
        r = docs.filter(F.col("doc_id") % 20 != 0)
        got = {(x.left_id, x.right_id)
               for x in jaccard_similarity_join(l, r, 0.75).collect()}
        lc = {x.doc_id: set(x.toks) for x in l.collect()}
        rc = {x.doc_id: set(x.toks) for x in r.collect()}
        brute = {
            (a, b)
            for a, ta in lc.items()
            for b, tb in rc.items()
            if len(ta & tb) / len(ta | tb) >= 0.75
        }
        assert got == brute and brute

    def test_bad_threshold(self, spark):
        from smartbots_etl_facturas_spark.operators.linkage import (
            jaccard_similarity_join,
        )

        df = spark.createDataFrame([(1, ["a"])], "doc_id long, toks array<string>")
        with pytest.raises(ValueError):
            jaccard_similarity_join(df, df, 0.0)

    def test_exact_boundary_threshold_not_dropped(self, spark):
        """Regression: float ceil(t*n) overshoots exact integer
        products (0.34*150 -> 51.000000000000007 -> ceil 52), which
        made the prefix AND length filters drop pairs whose Jaccard
        is EXACTLY the threshold. The integer-arithmetic bounds must
        keep them."""
        from smartbots_etl_facturas_spark.operators.linkage import (
            jaccard_similarity_join,
        )

        a_toks = [f"t{i:03d}" for i in range(150)]
        b_toks = a_toks[-51:]          # |A∩B| = 51, |A∪B| = 150 -> J = 0.34
        l = spark.createDataFrame([(1, a_toks)], "doc_id long, toks array<string>")
        r = spark.createDataFrame([(2, b_toks)], "doc_id long, toks array<string>")
        got = jaccard_similarity_join(l, r, 0.34).collect()
        assert len(got) == 1 and got[0].jaccard == 51 / 150
