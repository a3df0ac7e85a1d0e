#!/usr/bin/env python3
"""Local pre-flight of the driver's correctness gate: run each oracle SQL in
DuckDB over the same testdata tables and compare (schema-insensitively:
columns sorted by name, rows sorted, values normalized) to Verify's parquet.

Usage: python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort()
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            res = con.execute(sql)
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:200]}")
            fail += 1
            continue
        try:
            res2 = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = [d[0] for d in res2.description]
            spark_rows = res2.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            fail += 1
            continue
        if sorted(duck_cols) != sorted(spark_cols):
            print(f"FAIL {name}: columns duck={sorted(duck_cols)} spark={sorted(spark_cols)}")
            fail += 1
            continue
        a, b = canon(duck_rows, duck_cols), canon(spark_rows, spark_cols)
        if a == b:
            print(f"OK   {name}: {len(a)} rows")
            ok += 1
        else:
            print(f"FAIL {name}: rows duck={len(a)} spark={len(b)}")
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"   first diff at {i}:\n     duck : {x}\n     spark: {y}")
                    break
            else:
                if len(a) != len(b):
                    longer, who = (a, "duck") if len(a) > len(b) else (b, "spark")
                    print(f"   extra {who} row: {longer[min(len(a), len(b))]}")
            fail += 1
    # rows-only queries
    queries = {d for d in __import__("os").listdir(out_dir) if d != "oracle_sql.json"}
    for name in sorted(queries - set(oracle)):
        n = con.execute(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
        print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
    print(f"\n{ok} ok, {fail} fail, {len(queries - set(oracle))} rows-only")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
