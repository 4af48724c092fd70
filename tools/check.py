#!/usr/bin/env python3
"""Dev-only cross-check: compare Verify.scala's parquet dumps vs DuckDB
running oracle_sql.json on the same test tables. Mirrors the driver's
correctness gate (sorted-by-column-name, row-sorted value compare).

Besides the PASS/FAIL lines, ALWAYS writes <out_dir>/check_result.json
with one record per query (status + full error text) — so a failure's
name and reason survive any output filtering on the terminal side
(SURVEY §6.9.6: a transient sweep FAIL once lost its name to a `tail`
pipe and cost a clean re-run to re-identify).

Usage: python3 tools/check.py <sf_dir> <out_dir> [only_query,...]
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and format to full precision
        return repr(v + 0.0)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return str(v)


def canon(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(names), sorted(out, key=lambda t: tuple(str(x) for x in t))


def check_one(con, out, name, sql):
    """Returns (ok: bool, detail: str)."""
    qdir = out / name
    if not qdir.exists():
        return False, "no spark output"
    files = sorted(qdir.glob("*.parquet"))
    tbl = pq.read_table(files[0]) if len(files) == 1 else pq.read_table(qdir)
    s_names = list(tbl.schema.names)
    s_rows = ([tuple(row) for row in
               zip(*[tbl.column(n).to_pylist() for n in s_names])]
              if tbl.num_rows else [])
    try:
        dtbl = con.execute(sql).arrow()
        d_names = list(dtbl.schema.names)
        d_rows = ([tuple(row) for row in
                   zip(*[dtbl.column(n).to_pylist() for n in d_names])]
                  if dtbl.num_rows else [])
    except Exception as e:
        return False, f"duckdb error: {e}"
    sn, sr = canon(s_names, s_rows)
    dn, dr = canon(d_names, d_rows)
    if sn != dn:
        return False, f"schema {sn} vs {dn}"
    # Typed compare, mirroring the driver: arrow types must line up too.
    # Coarse classes: the driver is lenient on timestamp unit/tz (r1
    # q_events_tumbling passed) but strict on int64 vs decimal128 (r1
    # q_events_json / q_events_sessionize failed on exactly that).
    def tclass(t):
        s = str(t)
        if s.startswith("timestamp"):
            return "timestamp"
        if s.startswith("decimal"):
            return "decimal"
        if s in ("float", "double"):
            return "float"
        if s.startswith(("int", "uint")):
            return "int"
        if s in ("string", "large_string"):
            return "string"
        return s
    s_types = [tclass(tbl.schema.field(n).type) for n in sn]
    d_types = [tclass(dtbl.schema.field(n).type) for n in dn]
    if s_types != d_types:
        return False, (f"arrow type mismatch:\n  cols : {sn}\n"
                       f"  spark: {s_types}\n  duck : {d_types}")
    if len(sr) != len(dr):
        return False, f"rows {len(sr)} vs {len(dr)}"
    if sr != dr:
        bad = next(i for i, (a, b) in enumerate(zip(sr, dr)) if a != b)
        return False, (f"value mismatch at sorted-row {bad}:\n  cols : {sn}\n"
                       f"  spark: {sr[bad]}\n  duck : {dr[bad]}")
    return True, f"{len(sr)} rows"


def main(sf_dir, out_dir, only=None):
    out = Path(out_dir)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).is_dir():  # ScaleGen-derived dirs are multi-part
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((out / "oracle_sql.json").read_text())
    names = sorted(oracle)
    if only:
        wanted = set(only.split(","))
        names = [n for n in names if n in wanted]
    records = {}
    n_pass = n_fail = 0
    for name in names:
        try:
            ok, detail = check_one(con, out, name, oracle[name])
        except Exception as e:  # harness bug or unreadable dump — still named
            ok, detail = False, f"checker error: {e!r}"
        records[name] = {"pass": ok, "detail": detail}
        if ok:
            n_pass += 1
            print(f"PASS {name} ({detail})")
        else:
            n_fail += 1
            print(f"FAIL {name}: {detail}")
    failed = sorted(n for n, r in records.items() if not r["pass"])
    summary = {"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
               "failed": failed, "queries": records}
    (out / "check_result.json").write_text(json.dumps(summary, indent=1))
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if failed:  # names are un-losable: repeated on the LAST line too
        print(f"== FAILED: {','.join(failed)} ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:4]))
