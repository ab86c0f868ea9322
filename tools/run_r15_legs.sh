#!/bin/bash
# Round-15 bench legs (optimization round 2). Same weather protocol as r14:
# every window brackets with the external sf0.1 canary (fair ~0.26 s), the
# full-suite windows keep the in-leg canary series ON.
#
#   full    — full 107-query suite window at sf0.1, RUNS=3
#             -> docs/bench/r15_windows/BENCH_r15_w<N>.json
#   subset  — comma-list in $SPARK_GRAFT_BENCH_QUERIES, RUNS=3
#             -> docs/bench/r15_windows/BENCH_r15_<TAG>_w<N>.json
#   snb     — SNB skew family decade re-leg at sf1+sf10, RUNS=3, canary off
#             -> docs/bench/r15_windows/BENCH_snb_sf{1,10}_r15.json
#
# Usage: tools/run_r15_legs.sh full [N]
#        tools/run_r15_legs.sh subset TAG "q1,q2,..." [N]
#        tools/run_r15_legs.sh snb
set -e
MODE=${1:?full|subset|snb}
OUT=/root/repo/docs/bench/r15_windows
mkdir -p "$OUT"

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
  full)
    N=${2:-1}
    echo "== canary (pre) =="; canary
    run_bench /root/testdata/sf0.1 "$OUT/BENCH_r15_w$N.json" 8g \
      "SPARK_GRAFT_BENCH_RUNS=3"
    echo "== canary (post) =="; canary
    ;;
  subset)
    TAG=${2:?tag}
    QS=${3:?comma-list}
    N=${4:-1}
    echo "== canary (pre) =="; canary
    run_bench /root/testdata/sf0.1 "$OUT/BENCH_r15_${TAG}_w$N.json" 8g \
      "SPARK_GRAFT_BENCH_QUERIES=$QS SPARK_GRAFT_BENCH_RUNS=3"
    echo "== canary (post) =="; canary
    ;;
  snb)
    echo "== canary (pre) =="; canary
    run_bench /tmp/sf1 "$OUT/BENCH_snb_sf1_r15.json" 48g \
      "SPARK_GRAFT_BENCH_QUERIES=$FAMILY SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_CANARY=0"
    echo "== canary (mid) =="; canary
    run_bench /tmp/sf10 "$OUT/BENCH_snb_sf10_r15.json" 48g \
      "SPARK_GRAFT_BENCH_QUERIES=$FAMILY SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_CANARY=0"
    echo "== canary (post) =="; canary
    ;;
  *) echo "unknown mode $MODE"; exit 1;;
esac
