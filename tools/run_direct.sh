#!/bin/bash
# Run a graft main directly against the compiled classes, bypassing the
# sbt build lock (so long benches can run while code is being edited).
# Mirrors build.sbt's javaOptions exactly: JDK17 add-opens + -Xmx8g
# (override with SPARK_DRIVER_MEM).
# Usage: tools/run_direct.sh graft.tools.ScaleBench /tmp/graft_sf10 q163_bfs_hops
set -euo pipefail
cd "$(dirname "$0")/.."
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -XX:+UnlockDiagnosticVMOptions \
  -XX:GCLockerRetryAllocationCount=64 \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$@"
