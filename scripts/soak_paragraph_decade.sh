#!/bin/bash
# Paragraph-family decade soak (round 13): q187 corpus-wide dedup, the
# staged digest-index build, the q190-shaped staged probe, and the
# fixed-2000-doc probe, at 500k -> 5M docs (reps=100/1000). The staged
# and fixed probes must stay batch-shaped while the corpus grows 10x;
# paragraph_dedup itself is corpus-linear by design (it rewrites every
# document's cleaned text). Run on an idle VM.
set -u
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
OPS="paragraph_dedup,paradg_index_build,paragraph_staged_probe,fixed_batch_paragraph_probe"
for reps in 100 1000; do
  echo "=== paragraph reps=$reps start $(date -u +%H:%M:%S) loadavg=$(cut -d' ' -f1 /proc/loadavg)"
  java $OPENS -Xmx32g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.tools.ScaleSoak $reps synthetic "$OPS" 2>&1 | grep -E "^\[soak\]"
done
echo "=== done $(date -u +%H:%M:%S) loadavg=$(cut -d' ' -f1 /proc/loadavg)"
