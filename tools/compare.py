#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and hash-compare (sorted rows, canonicalized floats).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob, math, os
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # ~9 significant digits, kills last-ulp noise
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def table_rows(con, sql):
    # relation API, not DB-API cursor: cursor.description collapses every
    # numeric to 'NUMBER', while rel.types carries the declared DuckDB
    # types. The type channel is the point — the driver's hash is
    # type-faithful (r9/r10 lesson: DuckDB emits HUGEINT for uncasted
    # integer sum() where Spark writes BIGINT parquet; values stringify
    # identically, so a value-only canon provably cannot see the
    # difference the driver fails on)
    rel = con.sql(sql)
    cols = list(rel.columns)
    types = [str(t) for t in rel.types]
    rows = rel.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], [types[i] for i in order], out

def selftest():
    """Prove the gate is type-faithful: an uncasted integer sum() (DuckDB
    HUGEINT) vs the BIGINT a Spark parquet would carry must FLAG even
    though every value stringifies identically — the exact r9/r10 driver
    red the old value-only canon provably passed."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT range AS x FROM range(5)")
    _, bare_t, bare_r = table_rows(con, "SELECT sum(x) AS s FROM t")
    _, cast_t, cast_r = table_rows(con, "SELECT CAST(sum(x) AS BIGINT) AS s FROM t")
    assert bare_r == cast_r, "values must stringify identically"
    assert bare_t != cast_t, \
        f"type channel failed to distinguish HUGEINT from BIGINT: {bare_t}"
    print(f"selftest OK: values equal ({bare_r}), types distinguish "
          f"{bare_t} vs {cast_t}")

def main():
    if sys.argv[1:2] == ["--selftest"]:
        selftest()
        return
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional: comma-separated oracle names to skip (the intentionally
    # pathological DuckDB formulations — O(n^2) Jaccard, recursive-CTE
    # closures — that take >10 min at sf0.1; used for at-scale runs only)
    skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    produced = set(
        os.path.basename(p) for p in glob.glob(os.path.join(out_dir, "*"))
        if os.path.isdir(p))
    # a query that errored in Verify writes NO output dir — flag it loudly
    # instead of silently shrinking the gate (st06 regression lesson)
    for name in sorted(set(oracles) - produced):
        results[name] = "NO_OUTPUT: query failed in Verify (see its stderr)"
    for name in sorted(produced):
        spark_path = os.path.join(out_dir, name)
        try:
            s_cols, s_types, s_rows = table_rows(con, f"SELECT * FROM '{spark_path}/*.parquet'")
        except Exception as e:
            results[name] = f"SPARK_READ_FAIL: {e}"
            continue
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(s_rows)}" + ("" if s_rows else " (EMPTY!)")
            continue
        if name in skip:
            results[name] = f"ROWS_ONLY rows={len(s_rows)} (oracle skipped by request)" + ("" if s_rows else " (EMPTY!)")
            continue
        try:
            o_cols, o_types, o_rows = table_rows(con, oracles[name])
        except Exception as e:
            results[name] = f"ORACLE_FAIL: {str(e)[:150]}"
            continue
        if s_cols != o_cols:
            results[name] = f"SCHEMA_MISMATCH spark={s_cols} oracle={o_cols}"
        elif s_types != o_types:
            td = [(c, a, b) for c, a, b in zip(s_cols, s_types, o_types) if a != b]
            results[name] = f"TYPE_MISMATCH (col, spark, oracle)={td}"
        elif len(s_rows) != len(o_rows):
            results[name] = f"ROWCOUNT spark={len(s_rows)} oracle={len(o_rows)}"
        elif s_rows != o_rows:
            diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
            results[name] = f"VALUE_MISMATCH first_diffs={diffs}"
        else:
            results[name] = f"MATCH rows={len(s_rows)}"
    # parity-sibling gate for the rows-only entries: a no-oracle row passes
    # only when (a) it declares hash-green sibling(s) in parity_siblings.json
    # and (b) every sibling present in this run is MATCH. Declaring no
    # sibling is itself a failure — a new approximate operator cannot
    # quietly widen the unchecked set.
    sib_path = os.path.join(out_dir, "parity_siblings.json")
    siblings = json.load(open(sib_path)) if os.path.exists(sib_path) else {}
    sib_note = {}
    for name, v in list(results.items()):
        if not v.startswith("ROWS_ONLY") or "skipped by request" in v:
            continue
        sibs = siblings.get(name)
        if not sibs:
            results[name] = f"NO_PARITY_SIBLING: rows-only entry with no declared hash-green sibling ({v})"
            continue
        # a sibling whose oracle was skipped BY REQUEST (the at-scale
        # pathological-oracle list) is unchecked this run, not red — only a
        # sibling that RAN and failed flips the dependent; absent/skipped
        # siblings are annotated so a full run remains the enforcing one
        in_run = [s for s in sibs if s in results]
        green = [s for s in in_run if results[s].startswith("MATCH")]
        skipped = [s for s in in_run if "skipped by request" in results[s]]
        red = [s for s in in_run if s not in green and s not in skipped]
        if red:
            results[name] = f"PARITY_SIBLING_RED: {','.join(red)} not MATCH ({v})"
        else:
            parts = []
            if green:
                parts.append(",".join(green))
            if skipped:
                parts.append(f"{','.join(skipped)} (oracle skipped this run)")
            absent = [s for s in sibs if s not in results]
            if absent:
                parts.append(f"{','.join(absent)} (not in this run)")
            results[name] = v + f" [parity: {'; '.join(parts)}]"
        sib_note[name] = sibs
    n_ok = sum(1 for v in results.values() if v.startswith(("MATCH", "ROWS_ONLY")))
    for k, v in sorted(results.items()):
        flag = "OK " if v.startswith(("MATCH", "ROWS_ONLY")) else "BAD"
        print(f"{flag} {k}: {v[:300]}")
    print(f"\n{n_ok}/{len(results)} pass")
    # SHA-stamped self-gate artifact (GATE_JSON=path): the committed record
    # that lets a round's driver gate be reconciled against the exact commit
    # it measured — the r9 lesson (4 phantom hash-fails from a mid-session
    # driver capture, indistinguishable from real failures without this)
    gate_json = os.environ.get("GATE_JSON")
    if gate_json:
        import subprocess, datetime
        try:
            sha = subprocess.run(["git", "rev-parse", "HEAD"], cwd=os.path.dirname(
                os.path.abspath(__file__)) + "/..", capture_output=True, text=True
            ).stdout.strip()
        except Exception:
            sha = "unknown"
        artifact = {
            "git_sha": sha,
            "date_utc": datetime.datetime.utcnow().strftime("%Y-%m-%dT%H:%M:%SZ"),
            "sf_dir": sf_dir,
            "n_pass": n_ok,
            "n_total": len(results),
            "rows": {k: dict(
                        {"ok": v.startswith(("MATCH", "ROWS_ONLY")), "detail": v[:200]},
                        **({"parity_sibling": sib_note[k]} if k in sib_note else {}))
                     for k, v in sorted(results.items())},
        }
        with open(gate_json, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"gate artifact -> {gate_json} (sha {sha[:12]})")
    sys.exit(0 if n_ok == len(results) else 1)

if __name__ == "__main__":
    main()
