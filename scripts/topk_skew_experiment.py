#!/usr/bin/env python
"""Hot-group top-k: naive single-window row_number vs the two-pass
bounded rewrite (operators/ranking.py:topk_per_group).

The fixture is the reference's one-carrier shape — one group holds
30% of an 8M-row fact — so the naive window's partitionBy(group)
funnels 2.4M rows through ONE task and sorts them there, while the
two-pass plan spreads the hot group over the source partitions and
never sorts more than k·n_partitions rows per group in pass 2.

Prints one JSON line {rows, hot_share, k, naive_sec, two_pass_sec,
speedup, equal} and feeds PERF.md. Equality is asserted on the full
result set, not sampled.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.ranking import topk_per_group
from smartbots_etl_facturas_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    k = 10
    spark = get_spark("topk-skew-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    # 30% of rows in group 0, the rest uniform over 10k groups;
    # (value, id) is a total order so both plans pick identical rows
    df = (
        spark.range(n)
        .select(
            F.when(F.col("id") % 10 < 3, F.lit(0))
            .otherwise((F.col("id") * 48271) % 10_000)
            .alias("g"),
            F.col("id"),
            ((F.col("id") * 69621) % 1_000_000).alias("v"),
        )
        .repartition(32)
        .persist()
    )
    df.count()  # materialize outside the timed region

    order = [F.desc("v"), F.col("id")]

    def naive():
        w = Window.partitionBy("g").orderBy(*order)
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn")
        )

    def two_pass():
        return topk_per_group(df, ["g"], order, k)

    def timed(fn):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    naive_sec = timed(naive)
    two_sec = timed(two_pass)
    equal = naive().exceptAll(two_pass()).count() == 0 and (
        two_pass().exceptAll(naive()).count() == 0
    )
    print(
        json.dumps(
            {
                "rows": n,
                "hot_share": 0.3,
                "k": k,
                "naive_sec": round(naive_sec, 3),
                "two_pass_sec": round(two_sec, 3),
                "speedup": round(naive_sec / two_sec, 2),
                "equal": equal,
            }
        )
    )


if __name__ == "__main__":
    main()
