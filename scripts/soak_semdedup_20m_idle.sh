#!/bin/bash
# Round-13 re-measurement of the 20M-vector semdedup decade (r12 verdict
# item 3): the r12 numbers were taken under sustained ambient load
# (7.2-7.7 for the whole 51-min build), so the growing-batch probe's
# 20.7x/decade slope could not be attributed. Re-run BOTH decade points
# (2M and 20M) on an idle VM — nothing else running, fixtures not
# generated concurrently — so the slope is load-clean. Expect
# <=~12x/decade if ambient explained the excess; anything above that
# needs a root-cause note in SURVEY 8.21a's replacement row.
set -u
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
OPS="semdedup_index_build,semdedup_staged_probe,fixed_batch_semdedup_probe"
# ScaleSoak's reps multiplies the 2000-vector fixture: the r12 decade
# points were reps=1000 (2M vectors) and reps=10000 (20M) — the first
# r13 launch of this script mistakenly ran 100/1000 (200k/2M; that 2M
# point, measured idle, is kept in the log as corroboration).
for reps in 1000 10000; do
  echo "=== semdedup reps=$reps start $(date -u +%H:%M:%S) loadavg=$(cut -d' ' -f1 /proc/loadavg)"
  java $OPENS -Xmx32g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.tools.ScaleSoak $reps synthetic "$OPS" 2>&1 | grep -E "^\[soak\]"
done
echo "=== done $(date -u +%H:%M:%S) loadavg=$(cut -d' ' -f1 /proc/loadavg)"
