#!/bin/bash
# Round-13 fold-cost soak (r12 verdict item 1 "done" evidence):
# the posting maintainer driven 2200 batches at compaction cadence 100,
# once with the tiered (Bentley-Saxe) fold and once with the
# round-11 single-level fold as control. graft.delta.verbose prints one
# line per published segment (covered span + wall seconds): the tiered
# run's fold cost must stay bounded (small folds, occasional
# geometric merges) where the control's grows linearly in stream age.
set -u
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
COMMON="-Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dgraft.delta.verbose=true"

echo "=== tiered run start $(date -u +%H:%M:%S) loadavg=$(cut -d' ' -f1 /proc/loadavg)"
java $OPENS $COMMON -cp "$CP" graft.tools.StreamSoak \
  posting 2200 2000 100 100 2>&1 | grep -E "stream-soak|delta-compact"
echo "=== single-level control start $(date -u +%H:%M:%S) loadavg=$(cut -d' ' -f1 /proc/loadavg)"
java $OPENS $COMMON -Dgraft.delta.singleLevel=true -cp "$CP" graft.tools.StreamSoak \
  posting 2200 2000 100 100 2>&1 | grep -E "stream-soak|delta-compact"
echo "=== done $(date -u +%H:%M:%S)"
