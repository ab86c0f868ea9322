#!/usr/bin/env python3
"""Dev-side sf1 synthesizer (round-10 SCALING task): build a 10x sf0.1
corpus at /tmp/sf1 by unioning 10 key-shifted copies of the driver's
sf0.1 tables. Used ONLY for the scaling-envelope measurement (the next
decade of growth for the growing-query set) - never for oracle gates,
which stay on the driver's own testdata. Dimension tables (nation,
region) are shared reference data and copy through unshifted.

Key discipline: every copy i shifts each table's primary ids by
i * STRIDE(table) with strides that keep cross-table joins consistent
(orders.o_custkey shifts by the CUSTOMER stride, lineitem.l_orderkey by
the ORDERS stride, ...). Strides are multiples of 2520 = lcm(1..9) so
doc_id/vec_id modulus stripes (%3, %5, %10, %37 aside) keep their
population shares. Timestamps are left untouched: the event log keeps
its 30-day span with 10x the rows per day, which is how a real log
grows.

De-duplication of the copies themselves: a per-copy PREFIX tag on text
(not a suffix - a variable-length prefix shifts every byte offset, so
byte-window signatures across copies diverge instead of colliding
1:1), and embeddings ROTATED by i coordinates per copy (preserves
norms and within-copy pairwise cosines; cross-copy cosines decorrelate).
Without these, 10 byte-identical copies make every pair-finding query's
OUTPUT grow ~100x for 10x input (measured: mm_blockhash_pairs G=60,
curation_embed_decontam G=12 on the naive union) - a corpus artifact,
not an engine shape; a real 10x corpus is not 10 copies of itself.
"""
import os
import sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# Stride multiplier for CHAINED decades (sf1 -> sf10): the base strides sit
# just above sf0.1's max ids; a source that is itself a K-copy union has ids
# K x higher, so pass K here (the lcm(1..9) alignment survives scaling).
MULT = int(sys.argv[4]) if len(sys.argv) > 4 else 1

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

# lcm(1..9)-aligned strides comfortably above each table's max id
STRIDES = {
    "documents": 2520 * 2 * MULT,   # max sf0.1 doc_id 4999
    "embeddings": 2520 * MULT,      # max sf0.1 vec_id 1999
    "events_id": 2520 * 40 * MULT,  # max sf0.1 event_id 99999
    "events_user": 2520 * 4 * MULT, # user dimension
    "orders": 2520 * 240 * MULT,    # max sf0.1 o_orderkey ~600k
    "customer": 2520 * 6 * MULT,
    "supplier": 2520 * MULT,
    "part": 2520 * 8 * MULT,
}

# Embedding decorrelation per copy. First decade (MULT=1): rotate by i
# coordinates (norm- and within-copy-cosine-preserving; cross-copy cosines
# decorrelate). CHAINED decades cannot rotate again - rotation totals
# collide ((i1,i2) and (i1',i2') with i1+i2 = i1'+i2' yield byte-identical
# vectors, re-creating the exact-twin corpus artifact the rotation was
# built to avoid) - so MULT>1 applies a SEEDED PERMUTATION per copy
# instead: still orthogonal (norms and within-copy pairwise cosines exact),
# and permutation-compose-rotation collisions across copy pairs do not
# occur for distinct seeded shuffles.
import random
def emb_expr(i):
    if i == 0:
        return "embedding"
    if MULT == 1:
        return f"list_concat(embedding[{i}+1:], embedding[1:{i}])::FLOAT[]"
    perm = list(range(1, 65))
    random.Random(1000 + i).shuffle(perm)
    return f"list_select(embedding, {perm})::FLOAT[]"


def gen(table, sql):
    parts = " UNION ALL ".join(
        sql.format(i=i, texpr=text_expr(i)) for i in range(COPIES))
    con.execute(
        f"COPY ({parts}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


# Text decorrelation per copy. First decade (MULT=1): a single variable-
# length PREFIX tag — shifts every byte offset, so byte-window signatures
# (CDC, blockhash) diverge across copies. CHAINED decades (MULT>1) need
# more: a prefix leaves token n-grams (n>=2 tokens in) IDENTICAL across
# copies, so after two decades every 5-gram would carry multiplicity
# ~COPIES^2 and gram-keyed self-joins (source_overlap, decontaminate)
# would measure a corpus-duplication artifact (~multiplicity^2 join rows),
# not an engine shape. So MULT>1 INTERLEAVES the per-copy tag after every
# 3rd token: every >=4-token window spans a tag, making all 5-gram
# shingles copy-unique — cross-copy gram multiplicity stays at the
# PREVIOUS decade's level, which is the real-world shape (a 10x corpus
# shares n-grams, but not uniformly at 100x multiplicity).
def text_expr(i):
    if i == 0:
        return "text"
    if MULT == 1:
        return f"'copytag{i} ' || text"
    return ("array_to_string(flatten(list_transform(" +
            "range(0, greatest(len(string_split(text, ' ')), 1), 3), " +
            f"b -> list_append(string_split(text, ' ')[b+1:b+3], 'ctag{i}'))), ' ')")


gen("documents", f"""
  SELECT doc_id, text, lang, source,
         -- keep n_chars == length(text): the tag bytes count, and queries
         -- that weight/bucket by n_chars (curation sampling, length
         -- histograms) would otherwise measure a slightly wrong work shape
         length(text) AS n_chars
  FROM (SELECT doc_id + {{i}} * {STRIDES['documents']} AS doc_id,
               {{texpr}} AS text, lang,
               source || CASE WHEN {{i}} = 0 THEN '' ELSE '_c{{i}}' END AS source
        FROM '{SRC}/documents.parquet')""")

con.execute(
    "COPY (" + " UNION ALL ".join(
        f"""SELECT vec_id + {i} * {STRIDES['embeddings']} AS vec_id,
               {emb_expr(i)} AS embedding, label
            FROM '{SRC}/embeddings.parquet'""" for i in range(COPIES)) +
    f") TO '{DST}/embeddings.parquet' (FORMAT PARQUET)")
print("embeddings:",
      con.sql(f"SELECT count(*) FROM '{DST}/embeddings.parquet'").fetchone()[0], "rows")

gen("events", f"""
  SELECT event_id + {{i}} * {STRIDES['events_id']} AS event_id, ts,
         user_id + {{i}} * {STRIDES['events_user']} AS user_id,
         event_type, value, props
  FROM '{SRC}/events.parquet'""")

gen("lineitem", f"""
  SELECT l_orderkey + {{i}} * {STRIDES['orders']} AS l_orderkey,
         l_partkey + {{i}} * {STRIDES['part']} AS l_partkey,
         l_suppkey + {{i}} * {STRIDES['supplier']} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet'""")

gen("orders", f"""
  SELECT o_orderkey + {{i}} * {STRIDES['orders']} AS o_orderkey,
         o_custkey + {{i}} * {STRIDES['customer']} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet'""")

gen("customer", f"""
  SELECT c_custkey + {{i}} * {STRIDES['customer']} AS c_custkey,
         c_name || CASE WHEN {{i}} = 0 THEN '' ELSE '_c{{i}}' END AS c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM '{SRC}/customer.parquet'""")

gen("supplier", f"""
  SELECT s_suppkey + {{i}} * {STRIDES['supplier']} AS s_suppkey,
         s_name || CASE WHEN {{i}} = 0 THEN '' ELSE '_c{{i}}' END AS s_name,
         s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet'""")

gen("part", f"""
  SELECT p_partkey + {{i}} * {STRIDES['part']} AS p_partkey,
         p_name || CASE WHEN {{i}} = 0 THEN '' ELSE '_c{{i}}' END AS p_name,
         p_brand, p_type, p_size, p_retailprice
  FROM '{SRC}/part.parquet'""")

# shared reference dimensions: copy through once, unshifted
for t in ("nation", "region"):
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")

print(f"done -> {DST}")
