#!/usr/bin/env bash
# Run a graft main class directly against the compiled classes + /opt/spark/jars,
# bypassing sbt (sbt holds a project-wide lock; measurement runs must not queue
# behind a 20-minute test suite). Same JVM flags as build.sbt's run/fork.
# Usage: tools/run_graft.sh <mainClass> [args...]
set -euo pipefail
cd /root/repo
MAIN="$1"; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-48g}" \
  -XX:-DontCompileHugeMethods \
  -XX:ReservedCodeCacheSize=512m \
  ${GRAFT_EXTRA_JVM:-} \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
