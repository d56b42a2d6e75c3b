#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (BASELINE.md t2).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
same parquet tables, and compares: row count, column names (sorted),
and a hash of all values (both order-sensitive and order-insensitive
variants, so we catch ordering bugs before the driver does).

Driver-side only (python/duckdb are not available to the engine).
"""
import hashlib
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr round-trips doubles exactly
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = ["\x01".join(canon(r[i]) for i in order) for r in rows]
    h_ordered = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    h_sorted = hashlib.sha256("\n".join(sorted(lines)).encode()).hexdigest()
    return h_ordered, h_sorted


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            want = con.execute(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(got_cols) != sorted(want_cols):
            problems.append(f"cols spark={sorted(got_cols)} duck={sorted(want_cols)}")
        if len(got_rows) != len(want_rows):
            problems.append(f"rows spark={len(got_rows)} duck={len(want_rows)}")
        if not problems:
            go, gs = table_hash(got_rows, got_cols)
            wo, ws = table_hash(want_rows, want_cols)
            if go != wo:
                if gs == ws:
                    problems.append("hash differs ONLY by row order")
                else:
                    problems.append("value hash differs")
                    # show first differing row for debugging
                    order_g = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
                    order_w = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
                    for i, (g, w) in enumerate(zip(got_rows, want_rows)):
                        cg = [canon(g[j]) for j in order_g]
                        cw = [canon(w[j]) for j in order_w]
                        if cg != cw:
                            problems.append(f"  first diff row {i}:")
                            problems.append(f"    spark={cg}")
                            problems.append(f"    duck ={cw}")
                            break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print("      " + p)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
