#!/usr/bin/env python3
"""Local pre-flight of the driver's correctness gate: run each oracle SQL in
DuckDB over the same testdata tables and compare (columns sorted by name,
rows sorted, values at full precision) to Verify's parquet.

Round-1 lesson: the driver reads the Spark parquet and the DuckDB result
through DIFFERENT paths, so DECIMAL scale metadata and TIMESTAMP tz-awareness
hash differently even when values are equal. This pre-flight therefore
  (a) reads the Spark parquet via pyarrow (not DuckDB) so representation
      differences are visible, and
  (b) hard-fails any query whose output schema contains a decimal or
      timestamp column — queries must emit BIGINT/DOUBLE/VARCHAR only.

Usage: python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import glob
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BANNED_TYPES = ("decimal", "timestamp", "date32", "date64", "time32", "time64")


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full round-trip precision — a 1-ulp diff must FAIL
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort()
    return out


def read_spark(out_dir, name):
    """Driver-style read of Verify's parquet: pyarrow, row-major tuples."""
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    tbl = pq.read_table(files)
    bad = [f.name for f in tbl.schema
           if any(b in str(f.type).lower() for b in BANNED_TYPES)]
    cols = tbl.schema.names
    rows = list(zip(*[tbl.column(c).to_pylist() for c in cols])) if tbl.num_rows else []
    return cols, rows, bad


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
            spark_cols, spark_rows, bad = read_spark(out_dir, name)
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            fail += 1
            continue
        if bad:
            print(f"FAIL {name}: banned output column types (decimal/timestamp): {bad}")
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
    queries = {d for d in os.listdir(out_dir) if d != "oracle_sql.json"}
    for name in sorted(queries - set(oracle)):
        n = con.execute(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
        print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
    print(f"\n{ok} ok, {fail} fail, {len(queries - set(oracle))} rows-only")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
