#!/bin/bash
# Round-17 scale evidence, second pass: decisions printed by the SHIPPED
# re-fit constant (4000 cand/fp — docs/soak_r17_scale.log is the
# measurement pass that produced the fit; its printouts ran the refuted
# 1500 rule). Three decades where the engine must say narrow AND narrow
# must measure faster, plus the ~14M-doc decade where the fitted
# crossover (C/D ~ 4000, extrapolating C/D ∝ D^0.8 from the measured
# decades) predicts the decision flips to wide.
cd /root/repo
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run() { java -cp "target/scala-2.13/classes:/opt/spark/jars/*" $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g graft.tools.ScaleSoak "$@"; }
echo "=== audio two-width reps=100 (500k docs)"
run 100 synthetic audio_neardup,audio_neardup_wide
echo "=== audio two-width reps=400 (2M docs)"
run 400 synthetic audio_neardup,audio_neardup_wide
echo "=== audio two-width reps=1000 (5M docs)"
run 1000 synthetic audio_neardup,audio_neardup_wide
echo "=== audio two-width reps=2800 (14M docs, predicted crossover)"
run 2800 synthetic audio_neardup,audio_neardup_wide
echo "=== all scale runs done"
