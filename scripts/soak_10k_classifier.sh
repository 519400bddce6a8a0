#!/bin/bash
# Round-13 long-age soak (r12 verdict item 8): one maintainer family to
# 10^4 batches at compaction cadence 300 — the age regime where the
# round-12 single-level fold's linear growth binds. Done-evidence: a
# flat-or-logarithmic fold-cost curve ([delta-compact] lines) through
# batch 10000 and persistent_rdds=0 at DONE. Classifier family: the
# cheapest per-batch maintainer (label + <=65536-bucket count + tiny
# segment write), so the curve isolates compaction, not batch work.
set -u
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
echo "=== classifier 10k soak start $(date -u +%H:%M:%S) loadavg=$(cut -d' ' -f1 /proc/loadavg) (loads annotated per line; the claim is the fold-cost SHAPE over stream age)"
java $OPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dgraft.delta.verbose=true -cp "$CP" graft.tools.StreamSoak \
  classifier 10000 2000 500 300 2>&1 | grep -E "stream-soak|delta-compact"
echo "=== done $(date -u +%H:%M:%S)"
