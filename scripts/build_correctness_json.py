#!/usr/bin/env python3
"""Assemble a driver-gate-shaped CORRECTNESS json from a graft.Verify dump:
per query spark_rows / oracle_rows / rows_match / schema_match / hash_match
(hash_match = full value compare via check_oracle.compare) / err.

Usage: build_correctness_json.py <sf_dir> <verify_out_dir> <out.json> <note>
"""
import sys, os, json, glob
import duckdb
import pandas as pd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import TABLES, compare

def main():
    sf_dir, out_dir, out_json, note = sys.argv[1:5]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    queries = {}
    for name, sql in sorted(oracle.items()):
        entry = {"err": None, "hash_match": False, "rows_match": False,
                 "schema_match": False, "spark_rows": 0, "oracle_rows": 0}
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            entry["err"] = "no spark output"
            queries[name] = entry
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        entry["spark_rows"] = len(spark_df)
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            entry["err"] = f"oracle sql error: {e}"
            queries[name] = entry
            continue
        entry["oracle_rows"] = len(odf)
        entry["rows_match"] = len(spark_df) == len(odf)
        entry["schema_match"] = sorted(spark_df.columns) == sorted(odf.columns)
        err = compare(name, spark_df, odf)
        entry["hash_match"] = err is None
        if err is not None:
            entry["err"] = err
        queries[name] = entry
    sf = sf_dir.rstrip("/").split("/")[-1].replace("sf", "")
    json.dump({"note": note, "queries": queries, "sf": float(sf)},
              open(out_json, "w"), indent=1, sort_keys=True)
    ok = sum(1 for v in queries.values() if v["hash_match"])
    print(f"{ok}/{len(queries)} hash-matched -> {out_json}")

if __name__ == "__main__":
    main()
