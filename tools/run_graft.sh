#!/bin/bash
# Direct-JVM runner for graft mains (bypasses the sbt server lock so a
# non-timed tool can run while another sbt JVM is busy). Mirrors
# build.sbt's javaOptions (JDK17 add-opens, heap via SPARK_DRIVER_MEM,
# SPARK_GRAFT_JAVA_OPTS passthrough).
set -euo pipefail
MAIN="$1"; shift
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" ${SPARK_GRAFT_JAVA_OPTS:-} \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
