#!/usr/bin/env python3
"""Dev-only cross-check: compare Verify.scala's parquet dumps vs DuckDB
running oracle_sql.json on the same test tables. Mirrors the driver's
correctness gate (sorted-by-column-name, row-sorted value compare).

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
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


def main(sf_dir, out_dir):
    out = Path(out_dir)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads((out / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = out / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        files = sorted(qdir.glob("*.parquet"))
        tbl = pq.read_table(files[0]) if len(files) == 1 else pq.read_table(qdir)
        s_names = list(tbl.schema.names)
        s_rows = ([tuple(row) for row in
                   zip(*[tbl.column(n).to_pylist() for n in s_names])]
                  if tbl.num_rows else [])
        try:
            dtbl = con.execute(oracle[name]).arrow()
            d_names = list(dtbl.schema.names)
            d_rows = ([tuple(row) for row in
                       zip(*[dtbl.column(n).to_pylist() for n in d_names])]
                      if dtbl.num_rows else [])
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        sn, sr = canon(s_names, s_rows)
        dn, dr = canon(d_names, d_rows)
        if sn != dn:
            print(f"FAIL {name}: schema {sn} vs {dn}"); n_fail += 1; continue
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
            print(f"FAIL {name}: arrow type mismatch:")
            print(f"  cols : {sn}")
            print(f"  spark: {s_types}")
            print(f"  duck : {d_types}")
            n_fail += 1; continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows {len(sr)} vs {len(dr)}"); n_fail += 1; continue
        if sr != dr:
            bad = next(i for i, (a, b) in enumerate(zip(sr, dr)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted-row {bad}:")
            print(f"  cols : {sn}")
            print(f"  spark: {sr[bad]}")
            print(f"  duck : {dr[bad]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(sr)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:3]))
