#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [jsonOut]

Loads each <name>/ parquet result written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over views of the
same testdata parquet tables, and compares (schema, rowcount, values).
With a third arg, also writes a per-query JSON summary (driver-gate
shaped: rows/schema/hash match flags) to that path.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

# The six graph-family oracles whose registered single-statement SQL
# (recursive closure + uncapped pair self-join) exceeds single-node
# DuckDB on amplified fixtures (GATE_X10_IID r10-r14 walls). Above the
# auto threshold the gate dispatches them to the chunked/materialized
# variant in graph_oracle_chunked.py (selfchecked frame-equal to the
# registered SQL at sf0.01 + sf0.1) — ONE entrypoint, no hand-merged
# bifurcation (r15 verdict #3).
GRAPH_CHUNKED = ["q_coaccess_components", "q_component_density",
                 "q_blast_radius", "q_knn_triangles",
                 "q_clustering_coeff", "q_peer_anomaly"]

def graph_auto_mode(sf_dir):
    """The size-based auto decision: the registered recursive oracles
    complete at sf0.1 (events ~2 MB; components took 726 s there) but
    blow past container resources on the x3+/amplified fixtures, so the
    default cutover sits just above sf0.1
    (GRAFT_GRAPH_ORACLE_AUTO_BYTES, default 4 MiB)."""
    p = f"{sf_dir}/events.parquet"
    if os.path.isdir(p):
        size = sum(os.path.getsize(f) for f in glob.glob(f"{p}/*.parquet"))
    else:
        size = os.path.getsize(p) if os.path.exists(p) else 0
    cut = int(os.environ.get("GRAFT_GRAPH_ORACLE_AUTO_BYTES",
                             str(4 * 1024 * 1024)))
    return "chunked" if size > cut else "original"

def graph_oracle_mode(sf_dir):
    """GRAFT_GRAPH_ORACLE: original | chunked | auto (default, by size)."""
    mode = os.environ.get("GRAFT_GRAPH_ORACLE", "auto")
    if mode in ("original", "chunked"):
        return mode
    if mode != "auto":
        raise SystemExit(f"check.py: unknown GRAFT_GRAPH_ORACLE={mode!r} "
                         "(expected original|chunked|auto)")
    return graph_auto_mode(sf_dir)

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints -> int64, floats -> float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir, json_out=None):
    con = duckdb.connect()
    # Amplified-fixture knobs: the x10 graph oracles (recursive CTEs over
    # a ~266M-row pair frame) spill tens of GB per thread at DuckDB's
    # default threads=|cores|; capping threads + dropping insertion-order
    # preservation keeps the spill inside the container's disk.
    if os.environ.get("GRAFT_DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['GRAFT_DUCKDB_THREADS'])}")
    if os.environ.get("GRAFT_DUCKDB_UNORDERED"):
        con.execute("SET preserve_insertion_order=false")
    if os.environ.get("GRAFT_DUCKDB_MEMLIMIT"):
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEMLIMIT']}'")
    only = set(os.environ["GRAFT_CHECK_ONLY"].split(",")) \
        if os.environ.get("GRAFT_CHECK_ONLY") else None
    def src(p):
        # driver testdata = single file; Spark-written fixtures = directory
        return f"{p}/*.parquet" if os.path.isdir(p) else p
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src(p)}')")
    # Mirror Tables.adaptEventTs: ScaleProbe-amplified fixtures write
    # events.ts as int64 epoch-nanos; rebuild the view with a timestamp
    # so every oracle's CAST(ts AS DATE)/EXTRACT stays valid.
    if os.path.exists(f"{sf_dir}/events.parquet"):
        (tsname, tstype) = [r for r in con.execute(
            "DESCRIBE events").fetchall() if r[0] == "ts"][0][:2]
        if tstype == "BIGINT":
            con.execute("CREATE OR REPLACE VIEW events AS "
                        f"SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) "
                        f"FROM read_parquet('{src(sf_dir + '/events.parquet')}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    report = {}
    graph_mode = graph_oracle_mode(sf_dir)
    chunked = [n for n in GRAPH_CHUNKED
               if graph_mode == "chunked" and n in oracle
               and (only is None or n in only)]
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        if name in chunked:
            continue  # dispatched to the chunked variant below
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "err": "no spark output"}
            continue
        try:
            spark_df = canon(pd.read_parquet(res_dir))
            duck_df = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "err": str(e)[:200]}
            continue
        rec = {"rows_match": len(spark_df) == len(duck_df),
               "schema_match": list(spark_df.columns) == list(duck_df.columns),
               "hash_match": False,
               "spark_rows": len(spark_df), "oracle_rows": len(duck_df),
               "err": None}
        report[name] = rec
        if not rec["schema_match"]:
            print(f"FAIL {name}: cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_bad += 1; continue
        if not rec["rows_match"]:
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_bad += 1; continue
        bad_cols = []
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            if pd.api.types.is_float_dtype(a):
                ok = np.allclose(a.fillna(-1e308), b.fillna(-1e308), rtol=0, atol=0)
            else:
                ok = a.equals(b)
            if not ok:
                bad_cols.append(c)
        if bad_cols:
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:2]:
                diff = spark_df[c] != duck_df[c]
                idx = diff[diff].index[:3]
                for i in idx:
                    print(f"   row {i}: spark={spark_df[c][i]!r} duck={duck_df[c][i]!r}")
            rec["err"] = f"value mismatch in {bad_cols}"
            n_bad += 1
        else:
            rec["hash_match"] = True
            n_ok += 1
            print(f"ok   {name} ({len(spark_df)} rows, {len(spark_df.columns)} cols)")
    if chunked:
        # lazy import: graph_oracle_chunked imports canon/TABLES from this
        # module, so a top-level import would be circular
        import graph_oracle_chunked as goc
        # frame-equal selfcheck vs the registered SQL runs wherever the
        # original can still run (i.e. chunked was FORCED at small scale,
        # or GRAFT_GRAPH_SELFCHECK=1); on auto-dispatched big fixtures the
        # original is exactly what can't run — there the structural
        # cap/tail assertion (derive_cap) still pins the rewrite.
        forced_small = (os.environ.get("GRAFT_GRAPH_ORACLE") == "chunked"
                        and graph_auto_mode(sf_dir) == "original")
        selfcheck = (os.environ.get("GRAFT_GRAPH_SELFCHECK") == "1"
                     or forced_small)
        print(f"dispatching {len(chunked)} graph oracles to the chunked "
              f"variant (mode={graph_mode}, selfcheck={selfcheck})")
        rep, g_ok, g_bad = goc.run(
            sf_dir, out_dir,
            chunks=int(os.environ.get("GRAFT_GRAPH_CHUNKS", "8")),
            threads=int(os.environ.get("GRAFT_DUCKDB_THREADS", "8")),
            memlimit=os.environ.get("GRAFT_DUCKDB_MEMLIMIT", "40GB"),
            only=set(chunked), selfcheck=selfcheck)
        report.update(rep)
        n_ok += g_ok
        n_bad += g_bad
    # queries without oracle: rows-only check. The GRAFT_CHECK_ONLY
    # filter applies here too — otherwise a subset run scores (and
    # merge_gate may merge) rows-only entries whose parquet output is
    # stale from a previous run.
    for res_dir in sorted(glob.glob(f"{out_dir}/*/")):
        name = res_dir.rstrip("/").split("/")[-1]
        if only is not None and name not in only:
            continue
        if name not in oracle:
            n = len(pd.read_parquet(res_dir)) if glob.glob(f"{res_dir}/*.parquet") else 0
            print(f"{'ok  ' if n > 0 else 'FAIL'} {name} (rows-only: {n})")
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": n,
                            "oracle_rows": None, "err": "no_oracle"}
            if n == 0: n_bad += 1
            else: n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    if json_out:
        summary = {"sf_dir": sf_dir, "ok": n_ok, "failed": n_bad,
                   "queries": report}
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
