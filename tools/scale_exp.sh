#!/bin/bash
# Scaling-gap experiment harness (VERDICT r3 item 2): fresh-JVM PageRank legs at
# 8 vs 32 cores across configurations. Usage: tools/scale_exp.sh <edgesDir>
set -u
EDGES="$1"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

leg() { # label cores iters warm partmult mem extra...
  local label=$1 cores=$2 iters=$3 warm=$4 pm=$5 mem=$6; shift 6
  local out
  out=$(java -Xmx${mem} $OPENS "$@" -cp "$CP" graft.tools.ScalingLeg "$EDGES" "$cores" "$iters" "$warm" "$pm" 2>/dev/null | grep '^eps=')
  echo "$label cores=$cores pm=$pm mem=$mem $out"
}

case "${2:-baseline}" in
baseline)
  for r in 1 2; do
    leg base 8 10 5 4 20g
    leg base 32 12 8 4 20g
  done ;;
shm)
  for r in 1 2; do
    leg shm 8 10 5 4 20g -Dspark.local.dir=/dev/shm/sparkleg
    leg shm 32 12 8 4 20g -Dspark.local.dir=/dev/shm/sparkleg
  done ;;
gc)
  for r in 1 2; do
    leg pgc 8 10 5 4 20g -XX:+UseParallelGC
    leg pgc 32 12 8 4 20g -XX:+UseParallelGC
  done ;;
combo)
  for r in 1 2; do
    leg combo 8 10 5 4 20g -XX:+UseParallelGC -Dspark.local.dir=/dev/shm/sparkleg
    leg combo 32 12 8 4 20g -XX:+UseParallelGC -Dspark.local.dir=/dev/shm/sparkleg
  done ;;
pm1)
  for r in 1 2; do
    leg pm1 8 10 5 1 20g -Dspark.local.dir=/dev/shm/sparkleg
    leg pm1 32 12 8 1 20g -Dspark.local.dir=/dev/shm/sparkleg
  done ;;
esac
