#!/usr/bin/env python3
"""Span-frequency SKEW fixture: documents.parquet with one fixed 16-token
boilerplate run injected into p% of documents.

Motivation: both document fixtures (rotation and --hold-density) preserve
the source corpus's benign duplicated-span layout (~4.76 dup-occ/doc, no
hot span), but the CANONICAL ExactSubstr input (Lee et al. 2022) is the
opposite — web boilerplate where one verbatim sentence occurs in a large
fraction of ALL documents. This generator builds that regime so
`Dedup.exciseDupSpans`' shuffle shape can be measured under it: a
16-token run yields 9 identical k=8 shingles per injected doc, i.e. 9
span hashes each with p%*N occurrences corpus-wide.

Injection is deterministic: docs with doc_id % 100 < p receive the run,
inserted at token position 1 + (doc_id mod max(1, n_toks)) so the
boundary shingles (mixing boilerplate with surrounding text) stay mostly
unique — only the fully-internal shingles are hot, as in real web text.

Only documents.parquet is written (the span family reads nothing else).

Usage: python3 tools/gen_span_skew.py outDir srcDir pctHot
  e.g.  python3 tools/gen_span_skew.py target/sf1skew30 target/sf1 30
"""
import os
import sys

import duckdb

DST = sys.argv[1]
SRC = sys.argv[2]
PCT = int(sys.argv[3])

HOT = ("click here to subscribe to our free newsletter and receive the "
       "latest updates every single day")  # 16 tokens

os.makedirs(DST, exist_ok=True)
con = duckdb.connect(config={"threads": 8})
con.execute(f"""
COPY (
  SELECT doc_id,
         CASE WHEN doc_id % 100 < {PCT} THEN
           array_to_string(
             list_concat(list_concat(
               toks[:1 + (doc_id % greatest(len(toks), 1))::INT],
               string_split('{HOT}', ' ')),
               toks[2 + (doc_id % greatest(len(toks), 1))::INT:]), ' ')
         ELSE text END AS text,
         lang, source, n_chars
  FROM (SELECT *, string_split(text, ' ') AS toks
        FROM '{SRC}/documents.parquet')
) TO '{DST}/documents.parquet' (FORMAT PARQUET)
""")
n, nhot = con.execute(f"""
  SELECT count(*), sum(CASE WHEN doc_id % 100 < {PCT} THEN 1 ELSE 0 END)
  FROM '{DST}/documents.parquet'""").fetchone()
print(f"documents: {n} rows, {nhot} hot ({100.0 * nhot / n:.1f}%)")
