#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads each `<outDir>/<name>` parquet (written by graft.Verify), runs the
matching oracle SQL from `<outDir>/oracle_sql.json` in DuckDB over the same
sf directory, canonicalizes both (columns sorted by name, rows sorted,
floats rounded), and reports row/schema/value match per query.

Usage: python3 tools/check_oracle.py <sfDir> <outDir> [query ...]

With GRAFT_ORACLE_JSON=<path> set, also writes the per-query results as a
JSON artifact ({"summary": {...}, "queries": {name: status}}) — the
committed belt-and-suspenders record for rounds where the driver's own
CORRECTNESS artifact ships empty.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    # Few worker threads by default: per-query work at these SFs is tiny,
    # and under host pressure DuckDB's default thread pool has been seen
    # dying with std::system_error EAGAIN (thread creation) / segfaults.
    con = duckdb.connect(
        config={"threads": int(os.environ.get("GRAFT_ORACLE_THREADS", "2"))})
    for name in ["region","nation","customer","supplier","part","orders",
                 "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    results = {}
    for qdir in sorted(glob.glob(os.path.join(out_dir, "q*"))):
        name = os.path.basename(qdir)
        if only and name not in only:
            continue
        try:
            mine = pd.read_parquet(qdir)
        except Exception as e:
            results[name] = f"ENGINE-READ-FAIL {e}"
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(mine)} rows)" + (" EMPTY!" if len(mine)==0 else "")
            continue
        try:
            ref = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-SQL-FAIL {e}"
            continue
        a, b = canon(mine), canon(ref)
        if len(a) != len(b):
            results[name] = f"ROWCOUNT {len(a)} vs {len(b)}"
        elif list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA {list(a.columns)} vs {list(b.columns)}"
        else:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              check_exact=False, rtol=0, atol=1e-9)
                results[name] = "OK"
            except AssertionError as e:
                msg = str(e).split("\n")[0:3]
                results[name] = "VALUES-DIFF " + " | ".join(msg)
                # show first differing rows
                neq = (a != b) & ~(a.isna() & b.isna())
                bad = neq.any(axis=1)
                if bad.any():
                    i = bad.idxmax()
                    results[name] += f" | row{i} mine={a.loc[i].to_dict()} ref={b.loc[i].to_dict()}"
    ok = sum(1 for v in results.values() if v == "OK" or v.startswith("rows-only"))
    for k, v in sorted(results.items()):
        flag = "PASS" if (v == "OK" or v.startswith("rows-only")) else "FAIL"
        print(f"{flag} {k}: {v}")
    print(f"== {ok}/{len(results)} pass")
    out_json = os.environ.get("GRAFT_ORACLE_JSON")
    if out_json:
        import datetime
        payload = {
            "summary": {
                "pass": ok,
                "total": len(results),
                "hash_checked": sum(1 for v in results.values() if v == "OK"),
                "rows_only": sum(1 for v in results.values()
                                 if v.startswith("rows-only")),
                "sf_dir": sf_dir,
                "checked_at": datetime.datetime.now(
                    datetime.timezone.utc).isoformat(timespec="seconds"),
            },
            "queries": {k: results[k] for k in sorted(results)},
        }
        with open(out_json, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {out_json}")

if __name__ == "__main__":
    main()
