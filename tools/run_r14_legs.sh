#!/bin/bash
# Round-14 re-timing legs (r13 verdict tasks 1/3/4) — run in a FAIR window
# (external canary <= ~0.33, i.e. 1.25x the 0.26 cross-round fair value):
#
#   retime  — the 13 fair_segment:false chain minima (BENCH_r13_local.json
#             detail src=r13) re-timed at sf0.1, RUNS=3, in-window canary ON
#             -> docs/bench/r14_windows/BENCH_r14_w<N>.json
#   snb     — SNB family decade re-leg at sf1+sf10, RUNS=3 (the r13
#             absolutes were RUNS=1 under 2.9-4.8x contention)
#             -> docs/bench/r14_windows/BENCH_snb_sf{1,10}_r14.json
#   sf1full — one full-suite window at sf1 (48g heap, in-window canary OFF,
#             external brackets) -> docs/bench/BENCH_sf1_r14_w<N>.json
#
# Usage: tools/run_r14_legs.sh {retime|snb|sf1full} [N]
set -e
MODE=${1:?retime|snb|sf1full}
N=${2:-1}
OUT=/root/repo/docs/bench/r14_windows
mkdir -p "$OUT"

# the 13 fair_segment:false r13-only chain minima
RETIME="ann_index_build,dedup_canonical_docs,dedup_containment,\
dedup_lsh_verified_pairs,dedup_minhash_lsh,dedup_simhash_pairs,\
dedup_simhash_pairs_skew,hybrid_search_ann,mm_blockhash_pairs,\
q_range_join_binned,sql_interface_hybrid,stream_ingest,text_lm_perplexity"
FAMILY="dedup_simhash_pairs,dedup_simhash_pairs_skew,mm_blockhash_pairs"

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

run_bench() { # $1 sfdir  $2 sidecar  $3 heap  $4 extra env (as VAR=val pairs)
  env $4 SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_OUT="$2" \
    java $ADD_OPENS -Xmx$3 \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/opt/spark/jars/*:/root/repo/target/scala-2.13/classes" \
    graft.Bench | tail -1
}

canary() { # external contention probe: stored cross-round fair value ~0.26 s
  SPARK_GRAFT_CPUS=32 java $ADD_OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/opt/spark/jars/*:/root/repo/target/scala-2.13/classes" \
    graft.Dev /root/testdata/sf0.1 time ann_bruteforce_topk | tail -1
}

case "$MODE" in
  retime)
    echo "== canary (pre) =="; canary
    run_bench /root/testdata/sf0.1 "$OUT/BENCH_r14_w$N.json" 8g \
      "SPARK_GRAFT_BENCH_QUERIES=$RETIME SPARK_GRAFT_BENCH_RUNS=3"
    echo "== canary (post) =="; canary
    ;;
  snb)
    echo "== canary (pre) =="; canary
    run_bench /tmp/sf1 "$OUT/BENCH_snb_sf1_r14.json" 48g \
      "SPARK_GRAFT_BENCH_QUERIES=$FAMILY SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_CANARY=0"
    echo "== canary (mid) =="; canary
    run_bench /tmp/sf10 "$OUT/BENCH_snb_sf10_r14.json" 48g \
      "SPARK_GRAFT_BENCH_QUERIES=$FAMILY SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_CANARY=0"
    echo "== canary (post) =="; canary
    ;;
  sf1full)
    echo "== canary (pre) =="; canary
    run_bench /tmp/sf1 "/root/repo/docs/bench/BENCH_sf1_r14_w$N.json" 48g \
      "SPARK_GRAFT_BENCH_RUNS=1 SPARK_GRAFT_BENCH_CANARY=0"
    echo "== canary (post) =="; canary
    ;;
  *) echo "unknown mode $MODE"; exit 1;;
esac
