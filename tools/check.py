#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (BASELINE.md t2).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify) with
pandas (pyarrow), runs the matching oracle SQL from oracle_sql.json in
DuckDB over the same parquet tables and materializes it with .df() —
EXACTLY like the driver — then compares: row count, column names
(sorted), and a hash of all values.

Why .df() and not fetchall(): the driver hashes pandas-materialized
values, where dtype matters. DuckDB HUGEINT (e.g. SUM(BIGINT) or an
integer window SUM) becomes float64 in pandas, so the oracle yields
`1.0` where Spark's parquet holds int64 `1` — a hash mismatch that
fetchall() (plain Python ints) silently erases. This bit q44 in r1 and
q23/q41 in r2; this script must fail on that class locally.

Driver-side only (python/duckdb/pandas are not available to the engine).
"""
import datetime
import hashlib
import json
import math
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonical string for one pandas-materialized cell.

    Must preserve the dtype-level rendering the driver sees: float 1.0
    and int 1 canon differently; NaN/NaT/None all mean missing.
    """
    if v is None:
        return "\x00NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)  # repr round-trips doubles exactly; keeps '1.0'
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, np.ndarray):
        return "[" + ",".join(canon(x) for x in v.tolist()) + "]"
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if v is pd.NaT:
        return "\x00NULL"
    if isinstance(v, pd.Timestamp) or (
            isinstance(v, datetime.datetime)):
        if pd.isna(v):
            return "\x00NULL"
        # driver evidence (r2: q04/q21/q37 green): spark DATE columns
        # materialize as datetime.date while duckdb DATE comes back as
        # midnight datetime64 — the driver hash treats them as equal,
        # so canon midnight timestamps date-only
        if (v.hour == 0 and v.minute == 0 and v.second == 0
                and v.microsecond == 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    try:
        if pd.isna(v):
            return "\x00NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def df_lines(df):
    """Rows of df as canonical strings, columns ordered by name.

    .tolist() (not .to_numpy()) so datetime64 cells surface as
    pd.Timestamp regardless of ns/us storage unit, while float64 cells
    stay float (1.0 != 1) — the dtype class the driver's hash sees.
    """
    cols = sorted(df.columns)
    arr = [df[c].tolist() for c in cols]
    n = len(df)
    return ["\x01".join(canon(a[i]) for a in arr) for i in range(n)]


def dtype_family(dt):
    """Driver r2 evidence calibrates what dtype gaps matter: int32 vs
    int64/int8 hash-match (q13/q24/q30 green), date-object vs
    midnight-datetime64 hash-match (q04/q21 green), but int vs float
    does NOT (1 vs 1.0 — the HUGEINT class that sank q44/q23/q41).
    So classify into families and only int-vs-float divergence is a
    failure in its own right."""
    s = str(dt)
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float")):
        return "float"
    if s.startswith("datetime64"):
        return "datetime"
    return s


def table_hash(df):
    lines = df_lines(df)
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
            got_df = pd.read_parquet(f"{out_dir}/{name}")
            want_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        # Driver-faithful sort probe: the driver calls
        # DataFrame.sort_values(by=sorted(cols)) on the RAW frames before
        # hashing, and a numpy-array cell is unhashable inside pandas'
        # lexsort (killed q34 in r1 and q85 in r3 while this script's
        # string-canonical sort stayed green). Reproduce that exact call
        # so the class dies locally.
        try:
            got_df.sort_values(by=sorted(got_df.columns))
            want_df.sort_values(by=sorted(want_df.columns))
        except Exception as e:
            print(f"FAIL {name}: driver sort_values probe raised "
                  f"{type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(got_df.columns) != sorted(want_df.columns):
            problems.append(
                f"cols spark={sorted(got_df.columns)} "
                f"duck={sorted(want_df.columns)}")
        if len(got_df) != len(want_df):
            problems.append(f"rows spark={len(got_df)} duck={len(want_df)}")
        if not problems:
            cols = sorted(got_df.columns)
            fam_g = [dtype_family(got_df[c].dtype) for c in cols]
            fam_w = [dtype_family(want_df[c].dtype) for c in cols]
            numeric_gap = [
                f"{c}: spark={got_df[c].dtype} duck={want_df[c].dtype}"
                for c, g, w in zip(cols, fam_g, fam_w)
                if g != w and {g, w} == {"int", "float"}]
            go, gs = table_hash(got_df)
            wo, ws = table_hash(want_df)
            if go != wo:
                if gs == ws:
                    problems.append("hash differs ONLY by row order")
                else:
                    problems.append("value hash differs")
                    if numeric_gap:
                        problems.append(
                            "  int-vs-float dtype divergence: " +
                            "; ".join(numeric_gap))
                    lg, lw = df_lines(got_df), df_lines(want_df)
                    for i, (g, w) in enumerate(zip(lg, lw)):
                        if g != w:
                            problems.append(f"  first diff row {i}:")
                            problems.append(f"    spark={g.split(chr(1))}")
                            problems.append(f"    duck ={w.split(chr(1))}")
                            break
            elif numeric_gap:
                # values hash equal (e.g. empty result) but one side is
                # float where the other is int — the exact class that
                # passes fetchall() yet fails the driver's pandas hash.
                problems.append("int-vs-float dtype divergence: " +
                                ";".join(numeric_gap))
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print("      " + p)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
