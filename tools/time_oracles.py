#!/usr/bin/env python3
"""Time DuckDB oracle SQL for selected gate entries (median of 3) — the
same-inventory DuckDB side of BASELINE head-to-head rows.

Usage: python3 tools/time_oracles.py <sfDir> <verifyOutDir> <name1,name2,...>
"""
import sys, json, os, time
import duckdb

def main():
    sf_dir, out_dir, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    for name in names:
        if name not in oracles:
            print(f"{name}: NO_ORACLE")
            continue
        sql = oracles[name]
        ts = []
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            ts.append(time.time() - t0)
        ts.sort()
        print(f"{name}: median {ts[1]:.3f} s runs {','.join(f'{t:.3f}' for t in ts)}")

if __name__ == "__main__":
    main()
