#!/bin/bash
# Scaling-ladder window (round-11 task 7): time the growing set (G >= 6 at
# the sf0.1->sf1 decade) at sf1 AND sf10 back-to-back in ONE quiet window,
# so the G ratio has a same-window numerator and denominator. Corpora are
# built by tools/gen_sf1.py (sf1: MULT=1 from the driver's sf0.1; sf10:
# COPIES=10 MULT=10 chained from sf1 — token-interleaved copy tags, see the
# script header). RUNS=1: at 100x sf0.1 the data cost dwarfs jitter and a
# 200 s query cannot afford 4 executions. Heap is raised to 48g (the
# run_verify.sh default 8g is sized for sf0.01 gate runs).
# Usage: tools/run_decade.sh [outdir] [sf1dir] [sf10dir]
set -e
OUT=${1:-/root/repo/docs/bench}
SF1=${2:-/tmp/sf1}
SF10=${3:-/tmp/sf10}
GROWING="curation_embed_decontam,curation_bloom_decontam,mm_video_frame_decode,\
q_range_join_binned,curation_source_overlap,curation_decontaminate,\
sketch_hll_distinct,dedup_minhash_lsh,dedup_substring_spans,ann_ivf_trained,\
text_bigram_lift,graph_triangle_count,ann_sq8_topk,sketch_kmv_jaccard"

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

bench() {  # $1 = sf dir, $2 = sidecar out
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_QUERIES="$GROWING" SPARK_GRAFT_BENCH_RUNS=1 \
  SPARK_GRAFT_BENCH_OUT="$2" \
  java $ADD_OPENS -Xmx48g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/opt/spark/jars/*:/root/repo/target/scala-2.13/classes" \
    graft.Bench | tail -1
}

canary() {  # contention probe: stored cross-round fair value ~0.26 s
  SPARK_GRAFT_CPUS=32 java $ADD_OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/opt/spark/jars/*:/root/repo/target/scala-2.13/classes" \
    graft.Dev /root/testdata/sf0.1 time ann_bruteforce_topk | tail -1
}

echo "== canary (pre) =="; canary
echo "== sf1 window =="; bench "$SF1" "$OUT/BENCH_sf1_r11_w1.json"
echo "== sf10 window =="; bench "$SF10" "$OUT/BENCH_sf10_r11_w1.json"
echo "== canary (post) =="; canary
