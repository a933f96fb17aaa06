#!/usr/bin/env python3
"""Assemble a gate JSON from multiple check.py runs (and, if needed, a
partial run's log).

Usage: merge_gate.py OUT [--log FILE] [--json FILE]... [--skip name=reason]...

Later sources override earlier ones per query. --log reconstructs entries
from check.py's stdout lines ("ok   name (N rows, M cols)" / "ok   name
(rows-only: N)" / "FAIL name: ..."), for runs that were stopped before the
final JSON write. --skip records a deliberately-not-run oracle with its
reason (the ×30 pattern: a documented abort beats a silent hole).
"""
import json, re, sys

def from_log(path):
    out = {}
    for line in open(path):
        m = re.match(r"ok   (\S+) \((\d+) rows, (\d+) cols\)", line)
        if m:
            out[m.group(1)] = {"rows_match": True, "schema_match": True,
                               "hash_match": True, "spark_rows": int(m.group(2)),
                               "oracle_rows": int(m.group(2)), "err": None}
            continue
        m = re.match(r"ok   (\S+) \(rows-only: (\d+)\)", line)
        if m:
            out[m.group(1)] = {"rows_match": None, "schema_match": None,
                               "hash_match": None, "spark_rows": int(m.group(2)),
                               "oracle_rows": None, "err": "no_oracle"}
            continue
        m = re.match(r"FAIL (\S+)(?::| \()(.*)", line)
        if m:
            out[m.group(1)] = {"rows_match": False, "schema_match": False,
                               "hash_match": False,
                               "err": m.group(2).strip().rstrip(")")}
    return out

def main(argv):
    out_path = argv[0]
    queries, skipped = {}, {}
    sf_dir = None
    i = 1
    while i < len(argv):
        if argv[i] == "--log":
            queries.update(from_log(argv[i + 1])); i += 2
        elif argv[i] == "--json":
            d = json.load(open(argv[i + 1]))
            queries.update(d["queries"]); sf_dir = d.get("sf_dir", sf_dir); i += 2
        elif argv[i] == "--skip":
            name, _, reason = argv[i + 1].partition("="); i += 2
            skipped[name] = reason
            queries.pop(name, None)
        else:
            raise SystemExit(f"unknown arg {argv[i]}")
    n_ok = sum(1 for v in queries.values()
               if v.get("hash_match") or (v.get("err") == "no_oracle"
                                          and (v.get("spark_rows") or 0) > 0))
    n_bad = len(queries) - n_ok
    summary = {"sf_dir": sf_dir, "ok": n_ok, "failed": n_bad,
               "skipped_oracles": skipped, "queries": queries}
    json.dump(summary, open(out_path, "w"), indent=1, sort_keys=True)
    print(f"{out_path}: {n_ok} ok, {n_bad} failed, {len(skipped)} skipped")

if __name__ == "__main__":
    main(sys.argv[1:])
