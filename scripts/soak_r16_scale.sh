#!/bin/bash
# Round-16 scale evidence runs (sequential; each a fresh JVM).
cd /root/repo
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run() { java -cp "target/scala-2.13/classes:/opt/spark/jars/*" $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx32g graft.tools.ScaleSoak "$@"; }
echo "=== dup_spans/full_curation reps=10"
run 10 synthetic dup_spans,full_curation
echo "=== dup_spans/full_curation reps=100"
run 100 synthetic dup_spans,full_curation
echo "=== audio crossover reps=400 (2M docs)"
run 400 synthetic audio_neardup,audio_neardup_wide
echo "=== all scale runs done"
