"""Local emulation of the driver's correctness gate: run each
__spark_entry__ query on Spark and its oracle on DuckDB at a given SF,
compare row counts and (column-name-sorted) values exactly.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod
    from sketchlib.spark.session import get_spark

    spark = get_spark("oracle-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        spark_rows = [tuple(r) for r in df.collect()]
        spark_cols = df.columns
        if name not in oracles:
            print(f"{name:38s} rows-only: {len(spark_rows)} rows "
                  f"{'OK' if spark_rows else 'EMPTY!'}")
            continue
        res = con.execute(oracles[name])
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
        a, b = norm(spark_rows, spark_cols), norm(duck_rows, duck_cols)
        ok = a == b
        if not ok:
            failures += 1
            print(f"{name:38s} MISMATCH rows={len(a)}/{len(b)} cols={sorted(spark_cols)}/{sorted(duck_cols)}")
            for x, y in list(zip(a, b))[:4]:
                if x != y:
                    print("   spark:", x)
                    print("   duck :", y)
        else:
            print(f"{name:38s} EXACT MATCH ({len(a)} rows)")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
