#!/bin/bash
# Run a compiled graft main directly (bypasses the sbt target-dir lock so
# long protocol/bench runs can proceed while sbt compiles/tests elsewhere).
# Usage: run_main.sh <mainClass> [args...]   (env knobs pass through)
MAIN="$1"; shift
# snapshot the compiled classes so a concurrent sbt recompile cannot swap
# class files under a running JVM (classloading is lazy)
SNAP=$(mktemp -d /tmp/graft-classes-XXXX)
cp -r /root/repo/target/scala-2.13/classes/* "$SNAP/"
trap 'rm -rf "$SNAP"' EXIT
SCALA_JARS=$(ls "$HOME"/.cache/coursier/v1/https/*/org/scala-lang/scala-library/2.13*/scala-library-2.13*.jar 2>/dev/null | head -1)
if [ -z "$SCALA_JARS" ]; then SCALA_JARS=$(find / -name "scala-library-2.13*.jar" -not -path "*/spark/*" 2>/dev/null | head -1); fi
java \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-16g}" \
  -XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing -XX:MaxMetaspaceSize=2g \
  -cp "$SNAP:$SCALA_JARS:/opt/spark/jars/*" \
  "$MAIN" "$@"
STATUS=$?
exit $STATUS
