#!/usr/bin/env python3
"""Diff two bench artifacts (BENCH_LOCAL.json / BENCH_r{N}.json format)
and flag per-query moves — the round-over-round triage that has been
done by hand since r3 (and mis-read twice: r3/r6 co-tenant phantoms,
r7 time-to-throw "timings").

Usage: python3 tools/bench_diff.py OLD.json NEW.json [threshold=1.5]

Reads both artifacts, matches queries by the qNN id prefix (full names
and driver-truncated ids both work), and reports:
  - errors appearing/disappearing (the -1.0 / "errors" markers)
  - queries moving more than threshold× in either direction
  - co-tenancy context (load1/cpu/wall) for both runs, because a
    global move with load1 >> cpu/wall is machine noise, not code.

Driver-side helper (python is not available to the engine itself).
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    qid = lambda k: k.split("_")[0]
    return {
        "path": path,
        "total": d.get("value"),
        "queries": {qid(k): v for k, v in d.get("queries", {}).items()},
        "names": {qid(k): k for k in d.get("queries", {})},
        "errors": {qid(e) for e in d.get("errors", [])},
        "ctx": {k: d.get(k) for k in
                ("load1_start", "load1_end", "cpu_sec", "wall_sec", "sf")},
    }


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    print(f"old: {old['path']} total={old['total']} ctx={old['ctx']}")
    print(f"new: {new['path']} total={new['total']} ctx={new['ctx']}")

    both = sorted(set(old["queries"]) & set(new["queries"]),
                  key=lambda q: int(q[1:]))
    only_old = sorted(set(old["queries"]) - set(new["queries"]))
    only_new = sorted(set(new["queries"]) - set(old["queries"]))
    if only_old:
        print(f"dropped queries: {', '.join(only_old)}")
    if only_new:
        print(f"added queries: {', '.join(only_new)}")

    err_new = new["errors"] - old["errors"]
    err_fixed = old["errors"] - new["errors"]
    if err_new:
        print(f"NEW ERRORS: {', '.join(sorted(err_new))}")
    if err_fixed:
        print(f"errors fixed: {', '.join(sorted(err_fixed))}")

    moved = []
    for q in both:
        o, n = old["queries"][q], new["queries"][q]
        if o < 0 or n < 0 or o < 0.05:  # errors handled above; noise floor
            continue
        r = n / o
        if r > thr or r < 1 / thr:
            moved.append((r, q, o, n))
    moved.sort(reverse=True)
    if moved:
        print(f"moves beyond {thr}x on the common set:")
        for r, q, o, n in moved:
            name = new["names"].get(q, q)
            print(f"  {name}: {o:.3f} -> {n:.3f}  ({r:.2f}x)")
    else:
        print(f"no per-query move beyond {thr}x on the common set")

    # totals over the healthy common set only — the comparison the raw
    # totals can't give when registries or error sets differ
    ho = sum(old["queries"][q] for q in both
             if old["queries"][q] >= 0 and new["queries"][q] >= 0)
    hn = sum(new["queries"][q] for q in both
             if old["queries"][q] >= 0 and new["queries"][q] >= 0)
    if ho > 0:
        print(f"healthy common-set total: {ho:.1f} -> {hn:.1f} ({hn/ho:.2f}x)")


if __name__ == "__main__":
    main()
