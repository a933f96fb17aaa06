#!/usr/bin/env bash
# Run a graft main directly with java (bypasses the sbt lock so gates can
# run concurrently with compiles). Mirrors build.sbt's forked JVM options —
# Spark 4 on JDK 17 needs the full add-opens set or Kryo fails on
# HeapByteBuffer for the MLlib paths.
# Usage: tools/run_main.sh <mainClass> [args...]   (SPARK_* env respected)
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="$1"; shift
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
exec java -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  "$MAIN" "$@"
