#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql vs Verify parquet dumps.

Mimics the driver's t2 correctness gate: for each query, run the oracle SQL in
DuckDB over the sfDir parquet tables, load the Spark result parquet, sort
columns by name, sort rows, and compare values exactly (with a tiny float
report so near-misses are visible).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = float(v)
            if isinstance(v, bytes):
                v = v.hex()
            vals.append(v)
        out.append(tuple(vals))
    key = lambda t: tuple((x is None, str(x)) for x in t)
    return sorted(out, key=key), [cols[i] for i in order]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            srows, scols = norm(spark_rel.fetchall(), spark_rel.columns)
            duck_rel = con.sql(sql)
            drows, dcols = norm(duck_rel.fetchall(), duck_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            failures += 1
            continue
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            failures += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            failures += 1
            continue
        bad = None
        float_eps = 0.0
        for a, b in zip(srows, drows):
            for x, y in zip(a, b):
                if x == y or (x is None and y is None):
                    continue
                if isinstance(x, float) and isinstance(y, float):
                    if math.isclose(x, y, rel_tol=1e-12, abs_tol=1e-12):
                        float_eps = max(float_eps, abs(x - y))
                        continue
                bad = (a, b)
                break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: first mismatch\n  spark={bad[0]}\n  duck ={bad[1]}")
            failures += 1
        else:
            note = f" (float eps {float_eps:.2e} — HASH WOULD MISMATCH)" if float_eps else ""
            print(f"OK   {name}: {len(srows)} rows{note}")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
