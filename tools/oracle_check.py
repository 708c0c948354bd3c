#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tooling only; the
engine itself is pure Scala/Spark). Reads Verify.scala's parquet dumps and
oracle_sql.json, runs each oracle in DuckDB against the sf tables, sorts
columns by name + rows by value, and compares cell-by-cell."""
import json, sys, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: everything to string via repr of python values, floats rounded-ish
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    out = df.apply(lambda col: col.map(cell))
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out

def main(out_dir: str, sf_dir: str):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"MISSING  {name} (no spark output)")
            n_bad += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df())
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"SCHEMA   {name}: spark={list(got.columns)} oracle={list(want.columns)}")
            n_bad += 1
        elif len(got) != len(want):
            print(f"ROWS     {name}: spark={len(got)} oracle={len(want)}")
            n_bad += 1
        elif not got.equals(want):
            diff = (got != want).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"VALUES   {name}: first diffs:")
            for i in idx:
                print(f"  spark : {got.loc[i].to_dict()}")
                print(f"  oracle: {want.loc[i].to_dict()}")
            n_bad += 1
        else:
            print(f"OK       {name} ({len(got)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
