#!/usr/bin/env python
"""Local mimic of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark AND its oracle_sql() on DuckDB
over the same sf dir, compare row multisets (columns sorted by name,
order-insensitive), and report per-query PASS/FAIL.

Usage: python scripts/check_parity.py [sf_dir] [query ...]
       python scripts/check_parity.py --only query [query ...] [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys
from decimal import Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _key(row):
    return tuple(repr(_norm(v)) for v in row)


def run_duckdb(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(cols), [tuple(r[i] for i in order) for r in rows]


def run_spark(spark, fn, sf_dir: str):
    df = fn(spark, sf_dir)
    cols = sorted(df.columns)
    rows = [tuple(r[c] for c in cols) for r in df.select(*cols).collect()]
    return cols, rows


def compare(name, spark, fn, sql, sf_dir, verbose=True):
    s_cols, s_rows = run_spark(spark, fn, sf_dir)
    d_cols, d_rows = run_duckdb(sql, sf_dir)
    problems = []
    if s_cols != d_cols:
        problems.append(f"columns differ: spark={s_cols} duckdb={d_cols}")
    if len(s_rows) != len(d_rows):
        problems.append(f"row counts differ: spark={len(s_rows)} duckdb={len(d_rows)}")
    if not problems:
        s_sorted = sorted(_key(r) for r in s_rows)
        d_sorted = sorted(_key(r) for r in d_rows)
        if s_sorted != d_sorted:
            diffs = [(a, b) for a, b in zip(s_sorted, d_sorted) if a != b]
            problems.append(f"{len(diffs)} value mismatches; first: {diffs[:3]}")
    if verbose:
        print(f"{'PASS' if not problems else 'FAIL'}  {name}  ({len(s_rows)} rows)")
        for p in problems:
            print(f"      {p}")
    return problems


def main():
    args = [a for a in sys.argv[1:] if a != "--only"]
    sf_dirs = [a for a in args if os.path.isdir(a)]
    sf_dir = sf_dirs[0] if sf_dirs else "/root/testdata/sf0.001"
    only = {a for a in args if a not in sf_dirs}

    import __spark_entry__ as entrymod

    if os.environ.get("SPARK_GRAFT_PARITY_DEFAULT_SESSION"):
        # driver-faithful mode: plain session (ANSI on, NO UTC/AQE/
        # shuffle tuning from the engine factory, host timezone)
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("parity-default")
            .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
            .config("spark.sql.ansi.enabled", "true")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from smartbots_etl_facturas_spark.session import get_spark

        spark = get_spark("parity-check", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            print(f"SKIP  {name}  (no oracle; rows={n})")
            results[name] = {"status": "no_oracle_rows_only", "rows": n}
            continue
        try:
            problems = compare(name, spark, fn, oracles[name], sf_dir)
            results[name] = (
                {"status": "pass"} if not problems
                else {"status": "fail", "problems": problems}
            )
            if problems:
                failed.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:300]}")
            results[name] = {"status": "error",
                             "error": f"{type(e).__name__}: {str(e)[:300]}"}
            failed.append(name)
    scope = (f"checked queries (--only subset of {len(qs)} registered)"
             if only else "queries")
    print(f"\n{len(results) - len(failed)}/{len(results)} {scope} match the oracle")
    out_path = os.environ.get("SPARK_GRAFT_PARITY_OUT")
    if out_path:
        import json

        with_oracle = [n for n in results if results[n]["status"] != "no_oracle_rows_only"]
        json.dump(
            {
                "sf_dir": sf_dir,
                "only_filter": sorted(only) if only else None,
                "total_registered": len(qs),
                "checked": len(results),
                "with_oracle": len(with_oracle),
                "oracle_pass": sum(
                    1 for n in with_oracle if results[n]["status"] == "pass"
                ),
                "failed": failed,
                "results": results,
            },
            open(out_path, "w"),
            indent=1,
            sort_keys=True,
        )
        print(f"wrote {out_path}")
    if failed:
        print("failed:", ", ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
