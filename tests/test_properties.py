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
