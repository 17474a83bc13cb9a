#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
given SF, then run each oracle SQL in DuckDB over the same parquet tables
and compare (columns sorted by name, rows sorted, values compared)."""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64") if df[c].isna().any() else df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def compare(name, spark_df, oracle_df):
    s, o = norm(spark_df), norm(oracle_df)
    if list(s.columns) != list(o.columns):
        return f"SCHEMA mismatch: spark={list(s.columns)} oracle={list(o.columns)}"
    if len(s) != len(o):
        return f"ROWS mismatch: spark={len(s)} oracle={len(o)}"
    for c in s.columns:
        a, b = s[c], o[c]
        # The driver hashes stringified values: int 123 vs float 123.0 is a
        # MISMATCH there. DuckDB sum(BIGINT) -> HUGEINT -> pandas float64 is
        # the classic trigger (fix: CAST(sum(..) AS BIGINT) in oracle SQL).
        if pd.api.types.is_float_dtype(a) != pd.api.types.is_float_dtype(b):
            return (f"DTYPE mismatch col={c}: spark={a.dtype} oracle={b.dtype}"
                    " (driver hash compares strings; int vs float fails)")
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            a = a.astype("float64"); b = b.astype("float64")
            bad = ~((a == b) | (a.isna() & b.isna()))
        else:
            bad = ~((a.astype(str) == b.astype(str)))
        if bad.any():
            i = bad.idxmax()
            return f"VALUE mismatch col={c} row={i}: spark={s[c][i]!r} oracle={o[c][i]!r} ({int(bad.sum())} bad)"
    return None

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO SPARK OUTPUT"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e}"
            continue
        err = compare(name, spark_df, odf)
        results[name] = err or "OK"
    ok = sum(1 for v in results.values() if v == "OK")
    for name, v in sorted(results.items()):
        print(("PASS " if v == "OK" else "FAIL ") + name + ("" if v == "OK" else f"  -> {v}"))
    # queries without oracle: rows-only check
    for name in glob.glob(f"{out_dir}/*/"):
        qn = name.rstrip("/").split("/")[-1]
        if qn not in oracle:
            n = sum(len(pd.read_parquet(f)) for f in glob.glob(f"{name}/*.parquet"))
            print(f"INFO {qn} (no oracle): {n} rows")
    print(f"\n{ok}/{len(results)} oracle-matched")

if __name__ == "__main__":
    main()
