#!/bin/bash
# Standalone-JVM launcher for the long probes/bench (graft.VolumeProbe,
# graft.Bench) — run inside tmux: an sbt-forked run dies with the
# sandbox's background-task timeout, and sbt must not compile while one
# of these JVMs is mid-flight (lazy classfile loads would mix versions).
# Usage: tools/run_probe.sh <MainClass> [env pre-set by caller]
set -u
MAIN="$1"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-48g}" \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN"
