#!/usr/bin/env python3
"""Derive the 10x-scale bench fixture (tmp/sf1) from /root/testdata/sf0.1.

The 10x tables BENCHNOTES_r13/r14/r15 quote were built ad hoc in DuckDB
each round; this checks the derivation in so the protocol is reproducible:

- every fact/dimension table replicated 10x with join keys shifted
  +rep*10^7 per replica, so each replica is a self-consistent world and
  replicas share no keys;
- nation/region stay SCALE-CONSTANT (25/5 rows, like real TPC-H
  dimensions), so nation-filtered anchors see 10x the rows;
- document text is rep-salted per token so replicas share no vocabulary
  (dedup/near-dup workloads must not find artificial cross-replica
  clones) EXCEPT the 8 corpus stopwords — the round-14 derivation lesson:
  salting stopwords zeroes the per-source stop-ratio statistics the
  curation gate reads, and AQE's empty-relation propagation then
  structurally DELETES the stats join (a correctness-shaped plan change
  from a fixture bug). n_chars is recomputed from the salted text;
- embeddings are perturbed +rep*1e-4 per component (replicas must not be
  exact near-dup pairs) with vec_id shifted like every other key.

Usage: tools/make_sf1.py [src_dir] [out_dir]
       defaults: /root/testdata/sf0.1 -> tmp/sf1 (gitignored)
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else \
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tmp", "sf1")
# optional 3rd arg: replica count (default 10 = the sf1 fixture); e.g.
#   tools/make_sf1.py /root/testdata/sf0.1 tmp/sf5 50
# derives the 50x fixture for single-anchor growth-curve points
N_REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
SHIFT = 10_000_000
REPS = f"range({N_REPS}) t(rep)"
# graft.ext's English stopword set (ExtQueries langProfiles / quality gates)
STOPS = "('the','and','of','to','in','is','that','with')"

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()


def copy(sql: str, table: str) -> None:
    con.execute(f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n}")


copy(f"""SELECT l_orderkey + rep*{SHIFT} AS l_orderkey,
                l_partkey + rep*{SHIFT} AS l_partkey,
                l_suppkey + rep*{SHIFT} AS l_suppkey,
                l_linenumber, l_quantity, l_extendedprice, l_discount,
                l_tax, l_returnflag, l_linestatus, l_shipdate
         FROM '{SRC}/lineitem.parquet', {REPS}""", "lineitem")
copy(f"""SELECT o_orderkey + rep*{SHIFT} AS o_orderkey,
                o_custkey + rep*{SHIFT} AS o_custkey,
                o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
         FROM '{SRC}/orders.parquet', {REPS}""", "orders")
copy(f"""SELECT c_custkey + rep*{SHIFT} AS c_custkey,
                c_name || '_' || rep AS c_name,
                c_nationkey, c_acctbal, c_mktsegment
         FROM '{SRC}/customer.parquet', {REPS}""", "customer")
copy(f"""SELECT s_suppkey + rep*{SHIFT} AS s_suppkey,
                s_name || '_' || rep AS s_name, s_nationkey, s_acctbal
         FROM '{SRC}/supplier.parquet', {REPS}""", "supplier")
copy(f"""SELECT p_partkey + rep*{SHIFT} AS p_partkey, p_name, p_brand,
                p_type, p_size, p_retailprice
         FROM '{SRC}/part.parquet', {REPS}""", "part")
copy(f"SELECT * FROM '{SRC}/nation.parquet'", "nation")
copy(f"SELECT * FROM '{SRC}/region.parquet'", "region")
copy(f"""SELECT event_id + rep*{SHIFT} AS event_id, ts,
                user_id + rep*{SHIFT} AS user_id, event_type, value, props
         FROM '{SRC}/events.parquet', {REPS}""", "events")
# rep 0 keeps the original text byte-for-byte; reps 1-9 salt every
# non-stopword token so replicas share no vocabulary but every replica
# keeps the original stop-ratio statistics
copy(f"""SELECT doc_id, text, lang, source,
                CAST(length(text) AS BIGINT) AS n_chars
         FROM (SELECT doc_id + rep*{SHIFT} AS doc_id,
                      CASE WHEN rep = 0 THEN text ELSE array_to_string(
                        list_transform(string_split(text, ' '),
                          tok -> CASE WHEN lower(tok) IN {STOPS} THEN tok
                                      ELSE tok || 'r' || rep END), ' ') END AS text,
                      lang, source
               FROM '{SRC}/documents.parquet', {REPS})""", "documents")
copy(f"""SELECT vec_id + rep*{SHIFT} AS vec_id,
                list_transform(embedding,
                  x -> CAST(x + rep*0.0001 AS FLOAT)) AS embedding,
                label
         FROM '{SRC}/embeddings.parquet', {REPS}""", "embeddings")
print(f"done -> {OUT}")
