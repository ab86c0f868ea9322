#!/bin/bash
# Round-13 task 6: one quiet-window leg timing the parallel sorted-
# neighborhood family (the r12 rewrite's shared helper) at sf1 AND sf10,
# so the family's G-factors are pinned on the SHIPPED 4-variant skew
# fixture (the only committed skew timing before this was one contended
# sf0.1 driver value). RUNS=1 at these SFs (data cost dwarfs jitter;
# see run_decade.sh). Heap 48g — the run_verify.sh default 8g makes every
# sf10 query fail into Bench's -1 sentinel. In-Bench canary is disabled
# (SPARK_GRAFT_BENCH_CANARY=0): at sf10 it costs ~linear; the window is
# bracketed by the EXTERNAL sf0.1 canary (fair ~0.26 s) instead.
# Usage: tools/run_snb_family.sh [outdir] [sf1dir] [sf10dir]
set -e
OUT=${1:-/root/repo/docs/bench}
SF1=${2:-/tmp/sf1}
SF10=${3:-/tmp/sf10}
FAMILY="dedup_simhash_pairs,dedup_simhash_pairs_skew,mm_blockhash_pairs"

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
  SPARK_GRAFT_BENCH_QUERIES="$FAMILY" SPARK_GRAFT_BENCH_RUNS=1 \
  SPARK_GRAFT_BENCH_CANARY=0 SPARK_GRAFT_BENCH_OUT="$2" \
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
echo "== sf1 window =="; bench "$SF1" "$OUT/BENCH_snb_sf1_r13.json"
echo "== canary (mid) =="; canary
echo "== sf10 window =="; bench "$SF10" "$OUT/BENCH_snb_sf10_r13.json"
echo "== canary (post) =="; canary
