"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5 notes it has none).

- F1 differential: the Column expression tree and the Arrow
  pandas_udf must agree on EVERY input, including garbage.
- J1 invariants: insert-only upsert preserves existing rows verbatim
  and adds exactly the new-PK incoming rows, for any key overlap.
"""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.functions.money import parse_money, parse_money_pandas_udf
from smartbots_etl_facturas_spark.operators.upsert import upsert_insert_only

# money-shaped and garbage inputs
_money_like = st.builds(
    lambda sign, digits, sep1, tail1, sep2, tail2, wrap: (
        wrap[0] + sign + digits + sep1 + tail1 + sep2 + tail2 + wrap[1]
    ),
    sign=st.sampled_from(["", "-"]),
    digits=st.text("0123456789", min_size=1, max_size=4),
    sep1=st.sampled_from(["", ".", ","]),
    tail1=st.text("0123456789", max_size=4),
    sep2=st.sampled_from(["", ".", ","]),
    tail2=st.text("0123456789", max_size=3),
    wrap=st.sampled_from([("", ""), ("$", ""), ("  ", "  "), ("$ ", " ")]),
)
_garbage = st.text(alphabet="0123456789.,$- aN/", max_size=12)
_money_inputs = st.lists(
    st.one_of(_money_like, _garbage, st.none()), min_size=1, max_size=60
)


@settings(max_examples=12, deadline=None)
@given(values=_money_inputs)
def test_money_expression_matches_pandas_udf(spark, values):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "idx long, raw string"
    )
    udf = parse_money_pandas_udf()
    rows = df.select(
        "idx",
        parse_money(F.col("raw")).alias("expr"),
        udf(F.col("raw")).alias("udf"),
    ).collect()
    for r in rows:
        assert r.expr == r.udf, f"idx={r.idx} raw={values[r.idx]!r}: {r.expr} != {r.udf}"


_keys = st.text("abc", min_size=1, max_size=2)
_rowsets = st.lists(
    st.tuples(_keys, _keys, st.integers(0, 999)), min_size=0, max_size=25
)


@settings(max_examples=12, deadline=None)
@given(ex_rows=_rowsets, in_rows=_rowsets)
def test_upsert_insert_only_invariants(spark, ex_rows, in_rows):
    # dedup PKs inside each batch (the operator's contract: callers
    # run U4 first-wins dedup first)
    ex = {(a, b): v for a, b, v in reversed(ex_rows)}
    inc = {(a, b): v for a, b, v in reversed(in_rows)}
    existing = spark.createDataFrame(
        [(a, b, v) for (a, b), v in ex.items()] or [("_", "_", 0)],
        "invoice_number string, reference_number string, total long",
    )
    incoming = spark.createDataFrame(
        [(a, b, v) for (a, b), v in inc.items()] or [("_", "_", 0)],
        "invoice_number string, reference_number string, total long",
    )
    if not ex:
        existing = existing.limit(0)
    if not inc:
        incoming = incoming.limit(0)

    result = {
        (r.invoice_number, r.reference_number): r.total
        for r in upsert_insert_only(
            existing, incoming, ["invoice_number", "reference_number"]
        ).collect()
    }
    # PK universe is the union; existing always wins on overlap
    expected = dict(inc)
    expected.update(ex)
    assert result == expected


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 30), st.booleans()),
        min_size=0, max_size=40, unique_by=lambda t: (t[0], t[1]),
    )
)
def test_take_while_matches_python_model(spark, rows):
    """P8 take-while == itertools.takewhile per partition, for any
    (group, position, stops) input."""
    from itertools import takewhile

    from smartbots_etl_facturas_spark.operators.ordered import take_while

    df = spark.createDataFrame(
        rows or [(99, 0, False)], "grp int, pos int, stops boolean"
    )
    if not rows:
        df = df.limit(0)
    out = take_while(df, "pos", F.col("stops"), partition_by=["grp"])
    got = sorted((r.grp, r.pos) for r in out.collect())

    expected = []
    by_grp = {}
    for g, p, s in sorted(rows):
        by_grp.setdefault(g, []).append((p, s))
    for g, items in by_grp.items():
        expected += [(g, p) for p, _ in takewhile(lambda t: not t[1], sorted(items))]
    assert got == sorted(expected)


_line_pool = ["header", "body one", "body two", "promo", "footer", "x y z", ""]
_docsets = st.lists(
    st.lists(st.sampled_from(_line_pool), min_size=1, max_size=5),
    min_size=1, max_size=10,
)


@settings(max_examples=12, deadline=None)
@given(docs=_docsets, max_occ=st.integers(1, 3))
def test_line_dedup_matches_python_model(spark, docs, max_occ):
    """line_dedup differential vs an exact Python model: global line
    counts, per-doc ordered filtering, kept/dropped tallies — for any
    doc set (including repeated empty lines) and any threshold."""
    from collections import Counter

    from smartbots_etl_facturas_spark.operators.dedup import line_dedup

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    counts = Counter(line for _, text in rows for line in text.split("\n"))
    expected = {}
    for i, text in rows:
        lines = text.split("\n")
        kept = [ln for ln in lines if counts[ln] <= max_occ]
        expected[i] = ("\n".join(kept), len(kept), len(lines) - len(kept))

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
           for r in line_dedup(df, max_occurrences=max_occ).collect()}
    assert got == expected


_word = st.sampled_from(["a", "b", "c", "dd", "ee"])
_texts = st.lists(
    st.lists(_word, min_size=1, max_size=6).map(" ".join),
    min_size=1, max_size=8,
)


@settings(max_examples=10, deadline=None)
@given(train_texts=_texts, test_texts=_texts)
def test_bigram_lm_matches_python_model(spark, train_texts, test_texts):
    """score_bigram_lm differential vs an exact Python stupid-backoff
    model over arbitrary tiny corpora: integer audit columns equal,
    avg_logprob equal to 1e-12."""
    import math
    from collections import Counter

    from smartbots_etl_facturas_spark.operators.lm import (
        score_bigram_lm,
        train_bigram_lm,
    )

    alpha = 0.4
    uni_c = Counter(w for t in train_texts for w in t.split())
    bi_c = Counter(
        (ws[i], ws[i + 1])
        for t in train_texts
        for ws in [t.split()]
        for i in range(len(ws) - 1)
    )
    total = sum(uni_c.values())
    expected = {}
    for i, t in enumerate(test_texts):
        ws = t.split()
        if len(ws) < 2:
            continue
        n_seen = n_backoff = n_oov = sum_c12 = 0
        lp = 0.0
        for w1, w2 in zip(ws, ws[1:]):
            if (w1, w2) in bi_c:
                n_seen += 1
                sum_c12 += bi_c[(w1, w2)]
                p = bi_c[(w1, w2)] / uni_c[w1]
            elif w2 in uni_c:
                n_backoff += 1
                p = alpha * uni_c[w2] / total
            else:
                n_oov += 1
                p = alpha / total
            lp += round(math.log(p), 6)
        n = len(ws) - 1
        expected[i] = (n, n_seen, n_backoff, n_oov, sum_c12, round(lp, 6) / n)

    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)], "doc_id long, text string")
    test = spark.createDataFrame(
        [(i, t) for i, t in enumerate(test_texts)], "doc_id long, text string")
    uni, bi = train_bigram_lm(train)
    got = {}
    for r in score_bigram_lm(test, uni, bi, alpha=alpha).collect():
        got[r.doc_id] = (r.n_bigrams, r.n_seen, r.n_backoff, r.n_oov,
                         r.sum_c12, r.avg_logprob)
    assert set(got) == set(expected)
    for i in expected:
        assert got[i][:5] == expected[i][:5], (i, got[i], expected[i])
        assert math.isclose(got[i][5], expected[i][5], rel_tol=0, abs_tol=1e-12), i


# --- round-4 second-session operators ---------------------------------------

_doc_texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=40), min_size=1, max_size=8
)


@settings(max_examples=10, deadline=None)
@given(texts=_doc_texts, chunk=st.integers(2, 6), stride_off=st.integers(0, 4))
def test_chunking_matches_python_model(spark, texts, chunk, stride_off):
    """chunk_documents vs a direct Python replay of its window spec:
    full coverage, exact overlap, short-final-chunk — on arbitrary
    whitespace soup."""
    from smartbots_etl_facturas_spark.operators.chunking import chunk_documents

    stride = max(1, chunk - stride_off)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {}
    for r in chunk_documents(df, chunk_tokens=chunk, stride=stride).collect():
        got.setdefault(r.doc_id, {})[r.chunk_idx] = (r.chunk_text, r.n_chunk_tokens)
    import re as _re

    for i, t in enumerate(texts):
        # mirror Spark's split(trim(text), '\s+'): "" yields [""]
        toks = _re.split(r"\s+", t.strip())
        overlap = chunk - stride
        expect = {}
        start, idx = 0, 0
        while True:
            piece = toks[start:start + chunk]
            expect[idx] = (" ".join(piece), len(piece))
            nxt = start + stride
            if nxt + 1 > max(len(toks) - overlap, 1):
                break
            start, idx = nxt, idx + 1
        assert got[i] == expect, (t, chunk, stride)


@settings(max_examples=10, deadline=None)
@given(
    series=st.lists(
        st.tuples(st.integers(0, 5), st.integers(-(10**6), 10**6)),
        min_size=1, max_size=30,
    ),
    denom=st.integers(2, 8),
)
def test_ewma_matches_python_model(spark, series, denom):
    """Integer EWMA vs a direct Python replay of the truncating
    recurrence, over arbitrary per-key integer series with ties
    broken by a sequence column."""
    from smartbots_etl_facturas_spark.operators.timeseries import ewma_smooth

    rows = [(k, i, i, x) for i, (k, x) in enumerate(series)]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, x_units long")
    got = {(r.user_id, r.event_id): r.ewma_units
           for r in ewma_smooth(df, alpha_denom=denom).collect()}
    acc: dict[int, int] = {}
    for k, i, _, x in rows:
        if k not in acc:
            acc[k] = x
        else:
            d = x - acc[k]
            q = abs(d) // denom
            acc[k] = acc[k] + (q if d >= 0 else -q)
        assert got[(k, i)] == acc[k]


@settings(max_examples=8, deadline=None)
@given(
    lsets=st.lists(st.sets(st.sampled_from("abcdefgh"), min_size=1, max_size=6),
                   min_size=1, max_size=6),
    rsets=st.lists(st.sets(st.sampled_from("abcdefgh"), min_size=1, max_size=6),
                   min_size=1, max_size=6),
    tau=st.sampled_from([0.34, 0.5, 0.67, 0.8, 1.0]),
)
def test_similarity_join_matches_bruteforce(spark, lsets, rsets, tau):
    """Prefix-filtered Jaccard join vs exhaustive Python comparison on
    arbitrary small set collections and thresholds (the PPJoin
    losslessness property, fuzzed)."""
    from smartbots_etl_facturas_spark.operators.linkage import (
        jaccard_similarity_join,
    )

    l = spark.createDataFrame(
        [(i, sorted(s)) for i, s in enumerate(lsets)],
        "doc_id long, toks array<string>",
    )
    r = spark.createDataFrame(
        [(100 + i, sorted(s)) for i, s in enumerate(rsets)],
        "doc_id long, toks array<string>",
    )
    got = {(x.left_id, x.right_id)
           for x in jaccard_similarity_join(l, r, tau).collect()}
    brute = {
        (i, 100 + j)
        for i, a in enumerate(lsets)
        for j, b in enumerate(rsets)
        if len(a & b) / len(a | b) >= tau
    }
    assert got == brute


# ---- round-8 property tests -------------------------------------------

_gqv_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),
              st.one_of(st.integers(-50, 50), st.none())),
    min_size=1, max_size=60,
)


@settings(max_examples=10, deadline=None)
@given(rows=_gqv_rows)
def test_group_quantile_values_matches_duckdb(spark, rows):
    """Histogram selection == DuckDB quantile_disc on ANY grouped
    integer multiset (with NULLs), for p10/p50/p90."""
    import duckdb

    from smartbots_etl_facturas_spark.operators.orderstats import (
        group_quantile_values,
    )

    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r.g: (r.p10, r.p50, r.p90)
        for r in group_quantile_values(
            df, ["g"], "v",
            [("p10", 1, 10), ("p50", 1, 2), ("p90", 9, 10)],
        ).collect()
    }
    want = {
        g: (p10, p50, p90)
        for g, p10, p50, p90 in duckdb.sql(
            "SELECT g, quantile_disc(v, 0.1), quantile_disc(v, 0.5), "
            "quantile_disc(v, 0.9) FROM (SELECT unnest($g) AS g, "
            "unnest($v) AS v) WHERE v IS NOT NULL GROUP BY g",
            params={"g": [r[0] for r in rows], "v": [r[1] for r in rows]},
        ).fetchall()
    }
    assert got == want


_holt_xs = st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=40)


@settings(max_examples=10, deadline=None)
@given(xs=_holt_xs)
def test_holt_linear_matches_python_reference(spark, xs):
    """The distributed Holt recurrence == a sequential pure-Python
    replay, for any integer series — including the partition-shuffled
    frame (ordering is recovered by the (ts, tie) sort)."""
    from smartbots_etl_facturas_spark.operators.timeseries import holt_linear

    def trunc_div(n, d):
        q = abs(n) // d
        return q if n >= 0 else -q

    level, trend, want = None, 0, []
    for x in xs:
        if level is None:
            level, trend = x, 0
        else:
            pred = level + trend
            new_level = pred + trunc_div(x - pred, 4)
            trend = trend + trunc_div(new_level - pred, 8)
            level = new_level
        want.append((level, trend))

    df = spark.createDataFrame(
        [(1, t, t, x) for t, x in enumerate(xs)],
        "user_id long, ts long, event_id long, x_units long",
    ).repartition(7)
    out = sorted(holt_linear(df).collect(), key=lambda r: r.ts)
    assert [(r.level_units, r.trend_units) for r in out] == want


# small fingerprint geometry (8 frames x 5 bands) so hypothesis can
# generate and shrink; the claims are geometry-independent
_AFP_F, _AFP_B = 8, 5
_afp_pcm = st.lists(
    st.integers(min_value=-4096, max_value=4095),
    min_size=_AFP_F * _AFP_B, max_size=_AFP_F * _AFP_B * 3,
)


@settings(max_examples=60, deadline=None)
@given(xs=_afp_pcm, c=st.integers(min_value=1, max_value=4))
def test_afp_amplitude_scaling_invariance_property(xs, c):
    """operators/audiofp.py's provable claim, as a property: the
    fingerprint words are EXACTLY invariant under positive integer
    amplitude scaling, for arbitrary PCM content (energies scale by
    c^2 > 0, every difference sign is preserved)."""
    from smartbots_etl_facturas_spark.operators.audiofp import (
        audio_fingerprint_words,
    )

    assert audio_fingerprint_words([x * c for x in xs], _AFP_F, _AFP_B) \
        == audio_fingerprint_words(xs, _AFP_F, _AFP_B)


@settings(max_examples=60, deadline=None)
@given(xs=_afp_pcm, frame=st.integers(min_value=0, max_value=_AFP_F - 1),
       fill=st.integers(min_value=-4096, max_value=4095))
def test_afp_one_frame_corruption_locality_property(xs, frame, fill):
    """The locality bound, as a property: overwriting ONE frame window
    with an arbitrary constant changes at most 2 of the frames-1
    words (samples of frame f feed only words f-1 and f)."""
    from smartbots_etl_facturas_spark.operators.audiofp import (
        audio_fingerprint_words,
    )

    base = audio_fingerprint_words(xs, _AFP_F, _AFP_B)
    seg = len(xs) // (_AFP_F * _AFP_B)
    width = _AFP_B * seg                   # one frame's sample span
    ys = list(xs)
    ys[frame * width:(frame + 1) * width] = [fill] * width
    got = audio_fingerprint_words(ys, _AFP_F, _AFP_B)
    assert sum(1 for a, b in zip(base, got) if a != b) <= 2
