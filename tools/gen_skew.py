#!/usr/bin/env python3
"""Skew-stress fixture: a hot-key decade for the salted-join rung.

gen_sf1.py replicates keys UNIFORMLY, so the salted-join (q100) and
skew-diagnostic (q226/q370) operators have only ever been measured
against benign key distributions. This script rewrites ~30% of
lineitem's join keys onto ONE hot order (the existing min orderkey),
deterministically (an integer hash of (orderkey, linenumber) — no
sampling nondeterminism), leaving orders untouched. Join fan-out for
the other 70% is preserved exactly.

Output is bench-only (graft.SkewBench); it is NOT a Verify surface —
queries whose oracles assume TPC-H fan-out would rightly fail on it.

Usage: python3 tools/gen_skew.py [outDir=target/sf1_skew] [src=target/sf1]
"""
import os
import sys

import duckdb

DST = sys.argv[1] if len(sys.argv) > 1 else "target/sf1_skew"
SRC = sys.argv[2] if len(sys.argv) > 2 else "target/sf1"

os.makedirs(DST, exist_ok=True)
con = duckdb.connect(config={"threads": 8})

hot = con.execute(
    f"SELECT min(o_orderkey) FROM '{SRC}/orders.parquet'").fetchone()[0]

con.execute(f"""
COPY (
  SELECT * REPLACE (
    CASE WHEN (l_orderkey * 2654435761 + l_linenumber) % 10 < 3
         THEN {hot} ELSE l_orderkey END AS l_orderkey)
  FROM '{SRC}/lineitem.parquet'
) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (SELECT * FROM '{SRC}/orders.parquet')
TO '{DST}/orders.parquet' (FORMAT PARQUET)
""")

n, nh = con.execute(f"""
SELECT count(*), sum(CASE WHEN l_orderkey = {hot} THEN 1 ELSE 0 END)
FROM '{DST}/lineitem.parquet'""").fetchone()
print(f"hot orderkey={hot}: {nh}/{n} rows ({100.0*nh/n:.1f}%) -> {DST}")
