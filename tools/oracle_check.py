#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each <name>.parquet
dumped by graft.Verify, run the matching oracle SQL in DuckDB over the same
sf directory's parquet tables and compare rows / schema / value hash the same
way the driver does (sort columns by name, sort rows, hash values).

Usage: python3 tools/oracle_check.py <verifyOutDir> <sfDir>
"""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # round floats to tolerate fp noise like the driver does (assume 6 digits)
    for c in df.columns:
        if df[c].dtype.kind == 'f':
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(repr(v) for v in row)).encode())
    return h.hexdigest()

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    results = {}
    for d in sorted(glob.glob(os.path.join(outdir, "*"))):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        files = glob.glob(os.path.join(d, "*.parquet"))
        spark_df = pd.concat([pd.read_parquet(f) for f in files]) if files \
            else pd.DataFrame()
        if name not in oracles:
            results[name] = {"err": "no_oracle", "spark_rows": len(spark_df)}
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = {"err": f"oracle_sql_error: {e}"}
            continue
        s, o = norm(spark_df), norm(odf)
        res = {
            "rows_match": len(s) == len(o),
            "schema_match": list(s.columns) == list(o.columns),
            "hash_match": None,
            "spark_rows": len(s), "oracle_rows": len(o),
        }
        if res["rows_match"] and res["schema_match"]:
            res["hash_match"] = value_hash(s.astype(str)) == value_hash(o.astype(str))
            if not res["hash_match"]:
                # find first differing cell for debugging
                ss, oo = s.astype(str), o.astype(str)
                diff = (ss != oo)
                if diff.any().any():
                    r = diff.any(axis=1).idxmax()
                    c = diff.loc[r].idxmax()
                    res["first_diff"] = {"row": int(r), "col": c,
                                         "spark": ss.loc[r, c], "oracle": oo.loc[r, c]}
        else:
            res["spark_cols"] = list(s.columns)
            res["oracle_cols"] = list(o.columns)
        results[name] = res
    bad = {k: v for k, v in results.items()
           if v.get("err") not in (None, "no_oracle") or v.get("hash_match") is False
           or v.get("rows_match") is False or v.get("schema_match") is False}
    n_oracle = sum(1 for v in results.values() if v.get("hash_match") is True)
    n_no = sum(1 for v in results.values() if v.get("err") == "no_oracle")
    print(f"total={len(results)} oracle_green={n_oracle} no_oracle={n_no} bad={len(bad)}")
    if bad:
        print(json.dumps(bad, indent=2, default=str))
    json.dump(results, open(os.path.join(outdir, "local_check.json"), "w"), indent=1)
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
