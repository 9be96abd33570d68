#!/bin/bash
# Scaling-gap experiment harness (VERDICT r3 item 2): run fresh-JVM PageRank legs
# at 8 vs 32 cores across configurations, print eps per leg.
# Usage: tools/scale_exp.sh <edgesDir> [reps]
set -u
EDGES="$1"
REPS="${2:-3}"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

leg() { # cores iters warm partmult mem extra_flags...
  local cores=$1 iters=$2 warm=$3 pm=$4 mem=$5; shift 5
  local out
  out=$(java -Xmx${mem} $OPENS "$@" -cp "$CP" graft.tools.ScalingLeg "$EDGES" "$cores" "$iters" "$warm" "$pm" 2>/dev/null | grep '^eps=')
  echo "cores=$cores pm=$pm mem=$mem flags='$*' $out"
}

for r in $(seq 1 "$REPS"); do
  for cores in 8 32; do
    it=$([ "$cores" = 32 ] && echo 12 || echo 10)
    wm=$([ "$cores" = 32 ] && echo 8 || echo 5)
    leg "$cores" "$it" "$wm" 4 20g
  done
done
