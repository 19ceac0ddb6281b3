#!/usr/bin/env python3
"""Compare ONE query's Spark parquet dump against an oracle SQL file.

Usage: python3 tools/check_one.py <sfDir> <sparkResultDir> <oracleSqlFile>

Same canonicalization as tools/check.py (columns sorted by name, rows
sorted, floats to 9g), but takes the SQL from a file so a single oracle can
be iterated without re-running graft.Verify.
"""
import os
import sys
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import canon, make_views  # ONE canonicalizer/view setup — check.py's


def main():
    sf_dir, res_dir, sql_file = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    make_views(con, sf_dir)
    got_rel = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
    got = canon(got_rel.fetchall(), got_rel.columns)
    want_rel = con.sql(open(sql_file).read())
    want = canon(want_rel.fetchall(), want_rel.columns)
    print(f"spark rows={len(got)} oracle rows={len(want)}")
    print(f"spark cols={sorted(got_rel.columns)} oracle cols={sorted(want_rel.columns)}")
    if got == want:
        print("MATCH")
    else:
        ws, gs = set(want), set(got)
        only_got = [r for r in got if r not in ws]
        only_want = [r for r in want if r not in gs]
        print(f"MISMATCH: {len(only_got)} spark-only, {len(only_want)} oracle-only")
        for r in only_got[:10]:
            print("  spark-only:", r)
        for r in only_want[:10]:
            print("  oracle-only:", r)


if __name__ == "__main__":
    main()
