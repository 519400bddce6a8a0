#!/bin/bash
# Round-14 decade soak (r13 verdict item 5): the two round-13 batch ops
# that lacked scale evidence — q188 clusterDiff and the sketch half of
# q191/q192 — at 500k -> 5M docs (reps=100/1000, skew mode: 6 sources,
# one owning 80%, ~10% exact dups — the realistic crawl shape, and the
# sketch needs >1 source for a non-degenerate pair frame). Both claim
# narrow scan-reduction shapes (clusterDiff: one conditional-agg pass
# over 24B/doc keys; sketch: one map-side min pass into |sources|x16
# cells, no distinct) — the decade slope should be ~corpus-linear.
set -u
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
OPS="cluster_diff,overlap_sketch"
for reps in 100 1000; do
  echo "=== batch-decade reps=$reps start $(date -u +%H:%M:%S) loadavg=$(cut -d' ' -f1 /proc/loadavg)"
  java $OPENS -Xmx32g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.tools.ScaleSoak $reps skew "$OPS" 2>&1 | grep -E "^\[soak\]"
done
echo "=== done $(date -u +%H:%M:%S) loadavg=$(cut -d' ' -f1 /proc/loadavg)"
