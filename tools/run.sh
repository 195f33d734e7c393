#!/bin/bash
# Fast runner: java against the packaged jar + /opt/spark/jars, skipping sbt
# startup. Usage: tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/out
set -e
JAR=$(ls /root/repo/target/scala-2.13/*.jar | head -1)
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADDOPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} \
  -cp "$JAR:/opt/spark/jars/*" "$@"
