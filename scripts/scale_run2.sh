#!/bin/bash
# Clean re-run of the measured ScaleBench sections (corpora already
# materialized; nothing else may run on the box during these).
set -uo pipefail
cd /root/repo
LOG=/tmp/scale
mkdir -p "$LOG"

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
rm -rf /tmp/scale/classes
cp -r target/scala-2.13/classes /tmp/scale/classes
CP="/tmp/scale/classes:/opt/spark/jars/*"
MEM="${SPARK_DRIVER_MEM:-24g}"

run() {
  local name=$1; shift
  echo "=== $name start $(date +%T) ===" | tee -a "$LOG/chain.log"
  java $ADD_OPENS -Xmx$MEM -Xms$MEM -XX:+AlwaysPreTouch -XX:+UseParallelGC \
       -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
       -cp "$CP" "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name done rc=$? $(date +%T) ===" | tee -a "$LOG/chain.log"
  return 0
}

run decode2   graft.tools.ScaleBench decode
run linearity2 graft.tools.ScaleBench linearity
run workload2 graft.tools.ScaleBench workload
SPARK_GRAFT_SCALE_ROUNDS=2 run protocol2 graft.tools.ScaleBench protocol sf0.3
echo "=== chain2 complete $(date +%T) ===" | tee -a "$LOG/chain.log"
