#!/bin/bash
# Round-17 scale evidence, third pass: the WIDE side of the banding
# dial. docs/soak_r17_scale2.log shows the engine choosing narrow (and
# narrow measuring faster) at every reachable synthetic-corpus decade —
# C/D grew ∝ D^0.8 and sat at 3695 even at 14M docs. The audio_hot
# fixture (ScaleSoak) generates the saturated-narrow regime directly
# (one hot 30-bit bucket, C/D ≈ D/2), so these decades record the
# decision printout on the SHIPPED 4000 constant at points where it
# must say WIDE, next to both arms' measured wall times. Decades:
#   reps=5  → D=10k,  C/D ≈  5k (just past the break-even)
#   reps=10 → D=20k,  C/D ≈ 10k
#   reps=20 → D=40k,  C/D ≈ 20k (narrow's quadratic term dominant)
cd /root/repo
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run() { java -cp "target/scala-2.13/classes:/opt/spark/jars/*" $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx32g graft.tools.ScaleSoak "$@"; }
echo "=== audio hot-bucket two-width reps=5 (D=10k, C/D ~5k)"
run 5 synthetic audio_hot_narrow,audio_hot_wide
echo "=== audio hot-bucket two-width reps=10 (D=20k, C/D ~10k)"
run 10 synthetic audio_hot_narrow,audio_hot_wide
echo "=== audio hot-bucket two-width reps=20 (D=40k, C/D ~20k)"
run 20 synthetic audio_hot_narrow,audio_hot_wide
echo "=== all hot-bucket runs done"
