#!/bin/bash
# Round-17 scale evidence runs (sequential; each a fresh JVM).
#
# Re-measures the audio two-width crossover with BOTH arms inside
# whole-stage codegen (r16 verdict item 1: the r16 wide measurements ran
# partly interpreted past janino's 64 KB limit, biasing the fitted
# break-even), at three decades — 500k / 2M / 5M docs — so the log
# records the engine's printed decision on the shipped constant at the
# scale where it says narrow AND at the scale where the crossover flips
# it to wide.
cd /root/repo
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run() { java -cp "target/scala-2.13/classes:/opt/spark/jars/*" $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx32g graft.tools.ScaleSoak "$@"; }
echo "=== audio two-width reps=100 (500k docs)"
run 100 synthetic audio_neardup,audio_neardup_wide
echo "=== audio two-width reps=400 (2M docs)"
run 400 synthetic audio_neardup,audio_neardup_wide
echo "=== audio two-width reps=1000 (5M docs)"
run 1000 synthetic audio_neardup,audio_neardup_wide
echo "=== all scale runs done"
