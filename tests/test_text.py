"""Text-analysis functions: PII redaction/audit goldens."""

from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.functions.text import pii_counts, redact_pii

ROWS = [
    (0, "write to alice.smith+x@sub.example.org today"),
    (1, "see https://example.com/a/b?q=1#frag for details"),
    (2, "call +56 9 1234 5678 or 222-333-4444 now"),
    (3, "no pii here, just the year 2024 and pi 3.14"),
    (4, "mixed: bob@x.io at https://x.io/b tel 9876543"),
    (5, "Fecha: 15-02-2026 total 1.234.567 ISO 2026-02-15"),   # NOT pii
]


def _redacted(spark):
    df = spark.createDataFrame(ROWS, "i long, text string")
    c = pii_counts(F.col("text"))
    return {
        r.i: r
        for r in df.select(
            "i",
            redact_pii(F.col("text")).alias("clean"),
            c["n_emails"].alias("e"),
            c["n_urls"].alias("u"),
            c["n_phones"].alias("p"),
        ).collect()
    }


def test_redact_pii_tokens(spark):
    got = _redacted(spark)
    assert got[0].clean == "write to <EMAIL> today"
    assert got[1].clean == "see <URL> for details"
    assert got[2].clean == "call <PHONE> or <PHONE> now"
    assert got[3].clean == ROWS[3][1]                      # untouched
    assert got[4].clean == "mixed: <EMAIL> at <URL> tel <PHONE>"
    # dates and thousands-separated amounts must SURVIVE the scrub —
    # the phone patterns are shape-anchored, not digit-run greedy
    assert got[5].clean == ROWS[5][1]


def test_pii_counts(spark):
    got = _redacted(spark)
    assert (got[0].e, got[0].u, got[0].p) == (1, 0, 0)
    assert (got[1].e, got[1].u, got[1].p) == (0, 1, 0)
    assert (got[2].e, got[2].u, got[2].p) == (0, 0, 2)
    assert (got[3].e, got[3].u, got[3].p) == (0, 0, 0)
    assert (got[4].e, got[4].u, got[4].p) == (1, 1, 1)
    assert (got[5].e, got[5].u, got[5].p) == (0, 0, 0)


def test_udtf_matches_expression_twin(spark):
    """The sentence-splitter UDTF and its built-in-expression twin
    (posexplode of a computed split array) must agree."""
    from pyspark.sql import functions as F

    from smartbots_etl_facturas_spark.functions.udx import (
        split_sentences_expr,
        split_sentences_udtf,
    )

    docs = spark.createDataFrame(
        [(1, "One. Two sentences! And a   spaced one? tail"),
         (2, "No terminator here"),
         (3, None)],
        "doc_id long, text string",
    )
    spark.udtf.register("split_sentences_t", split_sentences_udtf())
    docs.createOrReplaceTempView("v_udtf_docs")
    via_udtf = {(r.doc_id, r.sent_idx, r.sentence, r.n_tokens)
                for r in spark.sql(
                    "SELECT s.* FROM v_udtf_docs, "
                    "LATERAL split_sentences_t(doc_id, text) s").collect()}
    via_expr = {(r.doc_id, r.i, r.s, len(r.s.split()))
                for r in docs.filter(F.col("text").isNotNull()).select(
                    "doc_id",
                    F.posexplode(split_sentences_expr(F.col("text"))).alias("i", "s"),
                ).collect()}
    assert via_udtf == via_expr
    assert (1, 2, "And a   spaced one", 4) in via_udtf


def test_pii_adjacent_bare_runs_all_redacted(spark):
    """A bare-digits match consumes its trailing boundary, so a single
    pass misses every other adjacent run — the two-pass rule must
    catch them all, and pii_counts must agree with what the scrub
    emits."""
    from smartbots_etl_facturas_spark.functions.text import pii_counts, redact_pii

    rows = [(1, "call 1234567 7654321"),
            (2, "1111111 2222222 3333333 4444444"),
            (3, "total 1.234.567 and 1234567.89")]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: (r.clean, r.c.n_phones)
           for r in df.select(
               "id",
               redact_pii(F.col("text")).alias("clean"),
               pii_counts(F.col("text")).alias("c"),
           ).collect()}
    assert out[1] == ("call <PHONE> <PHONE>", 2)
    assert out[2] == ("<PHONE> <PHONE> <PHONE> <PHONE>", 4)
    assert out[3] == ("total 1.234.567 and 1234567.89", 0)  # separators survive


def test_pii_counts_agree_next_to_email_url_tokens(spark):
    """ADVICE regression: a bare digit run glued to an email/URL must
    produce the same n_phones the real scrub emits — the counting
    redaction uses the scrub's own tokens, so the boundary class next
    to a replaced email/URL is identical in both."""
    from smartbots_etl_facturas_spark.functions.text import pii_counts, redact_pii

    rows = [(1, "x,user@x.com1234567"),
            (2, "9876543https://ex.com/a"),
            (3, "a@b.com 1234567 c@d.net")]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: (r.clean, r.c.n_phones)
           for r in df.select(
               "id",
               redact_pii(F.col("text")).alias("clean"),
               pii_counts(F.col("text")).alias("c"),
           ).collect()}
    for i, (clean, n_phones) in out.items():
        assert clean.count("<PHONE>") == n_phones, (i, clean, n_phones)
