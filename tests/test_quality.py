

def test_impute_group_median_fills_exact_value(spark):
    from smartbots_etl_facturas_spark.operators.quality import (
        impute_group_median,
    )

    rows = [
        ("a", 1, 10), ("a", 2, 20), ("a", 3, 30), ("a", 4, None),
        ("b", 5, 7), ("b", 6, None),
        ("c", 7, None),  # group with NO observed values
    ]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    out = {r.id: r for r in
           impute_group_median(df, "g", "v", ["id"]).collect()}
    # median of {10,20,30} = value at rank ceil(3*0.5)=2 -> 20
    assert out[4].v == 20 and out[4].was_imputed
    # singleton group: rank ceil(1*0.5)=1 -> 7
    assert out[6].v == 7 and out[6].was_imputed
    # fully-missing group keeps NULL, flag still set
    assert out[7].v is None and out[7].was_imputed
    # observed rows untouched
    assert out[1].v == 10 and not out[1].was_imputed
    assert set(out[4].asDict()) == {"g", "id", "v", "was_imputed"}


def test_impute_group_median_even_count_rank_semantics(spark):
    """Even n takes the value at ceil(n/2) (lower middle) — the same
    rank-derived convention as mad_outliers, no interpolation."""
    from smartbots_etl_facturas_spark.operators.quality import (
        impute_group_median,
    )

    rows = [("g", 1, 10), ("g", 2, 20), ("g", 3, 30), ("g", 4, 40),
            ("g", 5, None)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    out = {r.id: r.v for r in
           impute_group_median(df, "g", "v", ["id"]).collect()}
    assert out[5] == 20
