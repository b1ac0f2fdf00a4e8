"""U2 schema validation + F5/F6 templating helpers."""

import pytest
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.functions.templating import html_to_text, render_template
from smartbots_etl_facturas_spark.sources.readers import SchemaValidationError, validate_schema


def test_validate_schema_ok(spark):
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    assert validate_schema(df, ["id", "v"]) == ([], [])


def test_validate_schema_reports_sorted_diffs(spark):
    df = spark.createDataFrame([(1, "a", "b")], "id long, zz string, aa string")
    missing, extra = validate_schema(df, ["id", "v", "w"], strict=False)
    assert missing == ["v", "w"]
    assert extra == ["aa", "zz"]
    with pytest.raises(SchemaValidationError) as ei:
        validate_schema(df, ["id", "v", "w"])
    assert ei.value.missing == ["v", "w"]


def test_render_template_known_unknown_css():
    out = render_template(
        "<style>body { margin: 0 }</style>Hola {name}, total {total}; keep {unknown}",
        {"name": "Ana", "total": 5},
    )
    assert "Hola Ana, total 5" in out
    assert "{ margin: 0 }" in out          # CSS braces untouched
    assert "{unknown}" in out              # unknown placeholder preserved


def test_html_to_text(spark):
    df = spark.createDataFrame(
        [("<p>Hola</p><br><BR/>mundo<div></div>\n\n\nfin",)], "h string"
    )
    out = df.select(html_to_text(F.col("h")).alias("t")).collect()[0].t
    assert "Hola" in out and "mundo" in out and "<" not in out
    assert "\n\n\n" not in out
