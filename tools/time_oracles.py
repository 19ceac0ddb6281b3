#!/usr/bin/env python3
"""Per-oracle DuckDB wall-time profile of the correctness gate.

Usage: python3 tools/time_oracles.py <sfDir> <verifyOutDir> [timeout_s]

Runs every oracle_sql.json entry (same views as tools/check.py) and prints
one line per query with its DuckDB execution seconds, slowest first — the
tool that finds which twin is blowing the driver's gate budget. A per-query
soft timeout (default 120 s) uses DuckDB's interrupt from a watchdog thread
so one pathological oracle can't hang the profile.
"""
import json, sys, time, threading
import duckdb

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.abspath(__file__)))
from check import make_views


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    budget = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name in sorted(oracles):
        con = duckdb.connect()
        make_views(con, sf_dir)
        timer = threading.Timer(budget, con.interrupt)
        timer.start()
        t0 = time.time()
        try:
            con.sql(oracles[name]).fetchall()
            times[name] = time.time() - t0
        except Exception as e:
            times[name] = time.time() - t0
            print(f"ERR/TIMEOUT {name} after {times[name]:.1f}s: {str(e)[:100]}",
                  flush=True)
        finally:
            timer.cancel()
            con.close()
    total = sum(times.values())
    print(f"\nTOTAL {total:.1f}s over {len(times)} oracles")
    for name, t in sorted(times.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{t:8.2f}s  {name}")


if __name__ == "__main__":
    main()
