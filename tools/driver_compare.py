#!/usr/bin/env python3
"""Driver-FAITHFUL replica of the correctness gate's compare step.

tools/compare.py reads the Spark parquet THROUGH DuckDB and canonicalizes
values to strings, which silently handles two whole classes of output the
real driver cannot: (1) complex-typed columns (list/struct/map) make
pandas' sort_values throw `unhashable type: 'numpy.ndarray'` — the r11
driver errored on 7 rows the string-canon replica passed; (2) DECIMAL
columns reach pandas as decimal.Decimal objects from pyarrow but float64
from duckdb's .df(), so their reprs differ even when values are equal.

This replica does what the r11 driver evidently does: pandas frames on
both sides, columns sorted by name, rows sorted by sort_values over every
column, values compared cell-by-cell by repr. Anything that errors or
mismatches HERE would error or mismatch in the driver.

Usage: python3 tools/driver_compare.py <sfDir> <verifyOutDir> [only,csv]
"""
import sys, json, glob, math, os
import duckdb
import pandas as pd


def load_spark(path):
    # the driver reads the Verify parquet via pandas/pyarrow, not DuckDB
    return pd.read_parquet(path)


def canon_cell(v):
    # mirror a type-sensitive value channel: repr distinguishes
    # Decimal('0.00') from 0.0 and numpy int64 from python int is unified
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass  # arrays: pd.isna returns an array — let them through to repr
    if isinstance(v, bool):
        return str(v).lower()
    # temporal normalization: a parquet DATE reaches pandas as datetime.date
    # while DuckDB's DATE arrives as datetime64 — the REAL driver passes
    # those rows (q20/q69/q92 green in r11), so equal instants must canon
    # equal here too; midnight-less dates normalize to midnight
    import datetime as _dt
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day).isoformat(sep=" ")
    import numpy as np
    if isinstance(v, np.datetime64):
        return pd.Timestamp(v).isoformat(sep=" ")
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (np.floating,)):
        f = float(v)
        return "NaN" if math.isnan(f) else f"{f:.9g}"
    return repr(v)


def frame_rows(df):
    cols = sorted(df.columns)
    df = df[cols]
    # THE driver seam: sort_values over object columns holding ndarrays or
    # dicts raises TypeError — exactly the r11 q79/q84/... failures
    df = df.sort_values(by=cols, kind="mergesort")
    return cols, ["|".join(canon_cell(v) for v in row) for row in df.itertuples(index=False)]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    produced = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(out_dir, "*"))
        if os.path.isdir(p))
    n_fail = 0
    for name in produced:
        if only is not None and name not in only:
            continue
        try:
            s_df = load_spark(os.path.join(out_dir, name))
            s_cols, s_rows = frame_rows(s_df)
        except Exception as e:
            print(f"FAIL {name}: spark-side {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no_oracle")
            continue
        try:
            o_df = con.sql(oracles[name]).df()
            o_cols, o_rows = frame_rows(o_df)
        except Exception as e:
            print(f"FAIL {name}: oracle-side {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if s_cols != o_cols:
            print(f"FAIL {name}: columns {s_cols} vs {o_cols}")
            n_fail += 1
        elif len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rows {len(s_rows)} vs {len(o_rows)}")
            n_fail += 1
        elif s_rows != o_rows:
            diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
            print(f"FAIL {name}: hash mismatch; first diffs:")
            for a, b in diffs:
                print(f"  spark : {a[:300]}")
                print(f"  oracle: {b[:300]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
