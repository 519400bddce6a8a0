#!/bin/bash
# Round-14 paragraph-maintainer stream soak (r13 verdict item 3): the
# eighth (paragraph-digest) family through >=2000 rate-source batches at
# compaction cadence 100 on the shared tiered folds. Done-evidence: flat
# trigger durations between fold points, a logarithmic fold-cost curve
# ([delta-compact] lines), and persistent_rdds=0 at DONE. The recycled
# 200k-id pool makes most arrivals exact re-deliveries — harmless BY
# ALGEBRA for this family (set presence), which is exactly the contract
# StreamingParagraphMaintenanceSpec pins at 3-batch scale.
set -u
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
echo "=== paragraph stream soak start $(date -u +%H:%M:%S) loadavg=$(cut -d' ' -f1 /proc/loadavg) (loads annotated per line; the claim is the fold-cost SHAPE over stream age)"
java $OPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dgraft.delta.verbose=true -cp "$CP" graft.tools.StreamSoak \
  paragraph 2200 2000 100 100 2>&1 | grep -E "stream-soak|delta-compact"
echo "=== done $(date -u +%H:%M:%S)"
