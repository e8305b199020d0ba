#!/usr/bin/env python3
"""DuckDB half of the SQL-replay fuzz gate (see graft.SqlReplayFuzz).

Usage: python3 tools/fuzz_check.py <fuzzOutDir>

Reads the adversarial inputs (texts, words) and the Scala kernels' expected
outputs written by `sbt "runMain graft.SqlReplayFuzz <fuzzOutDir>"`, runs the
pure-SQL replays from fuzz_sql.json in DuckDB over the same inputs, and
compares exactly. Driver-side tool only (duckdb lives in the container for
the harness, not for the Scala library).
"""
import json
import sys

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    out_dir = sys.argv[1]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW texts AS SELECT * FROM '{out_dir}/texts/*.parquet'")
    con.execute(f"CREATE VIEW words AS SELECT * FROM '{out_dir}/words/*.parquet'")
    with open(f"{out_dir}/fuzz_sql.json") as f:
        sqls = json.load(f)

    n_fail = 0
    for name, sql in sqls.items():
        exp = normalize(pd.read_parquet(f"{out_dir}/{name}"))
        got = normalize(con.execute(sql).fetchdf())
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns sql={list(got.columns)} scala={list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows sql={len(got)} scala={len(exp)}")
            n_fail += 1
            continue
        bad = None
        for c in got.columns:
            gv, xv = got[c].tolist(), exp[c].tolist()
            for i, (a, b) in enumerate(zip(gv, xv)):
                if a != b:
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col {c} row {i}: sql={a!r} scala={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
    print(f"\n{len(sqls) - n_fail} pass, {n_fail} fail / {len(sqls)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
