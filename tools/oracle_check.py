#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB over the same
testdata parquet, sorts columns by name + rows by all columns, and
compares values exactly. Mirrors (as closely as we can infer) what the
driver's CORRECTNESS_r{N}.json check does.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}.parquet"))
            exp = canon(con.execute(sql).fetchdf())
        except Exception as ex:
            print(f"FAIL {name}: {ex}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        if not got.equals(exp):
            neq = (got != exp) & ~(got.isna() & exp.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(got)} rows differ; first:")
            print(pd.concat([got[bad].head(3), exp[bad].head(3)],
                            keys=["got", "exp"]).to_string())
            # dtype detail
            for c in got.columns:
                if str(got[c].dtype) != str(exp[c].dtype):
                    print(f"  dtype {c}: {got[c].dtype} vs {exp[c].dtype}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - n_fail}/{len(oracle)} queries match")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
