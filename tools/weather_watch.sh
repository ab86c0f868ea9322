#!/bin/bash
# Round-14: background contention watcher. Probes the external canary
# (graft.Dev time ann_bruteforce_topk at sf0.1, fair ~0.26 s) every
# INTERVAL seconds and appends `epoch iso min runs` lines to LOG, so a
# fair window can be spotted and pounced on for the re-timing legs the
# r13 verdict demands (tasks 1/3/4). Purely a dev tool; never run by the
# driver.
# Usage: tools/weather_watch.sh [logfile] [interval_sec] [count]
LOG=${1:-/tmp/weather_r14.log}
INTERVAL=${2:-240}
COUNT=${3:-200}

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

for i in $(seq 1 "$COUNT"); do
  line=$(SPARK_GRAFT_CPUS=32 java $ADD_OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/opt/spark/jars/*:/root/repo/target/scala-2.13/classes" \
    graft.Dev /root/testdata/sf0.1 time ann_bruteforce_topk 2>/dev/null | tail -1)
  echo "$(date +%s) $(date -u +%FT%TZ) $line" >> "$LOG"
  sleep "$INTERVAL"
done
