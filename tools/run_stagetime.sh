#!/bin/bash
# Dev helper: per-stage timing of one query. Usage: tools/run_stagetime.sh <query> [sfDir] [cpus]
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS -Xmx16g -Dspark.ui.enabled=false \
  -cp "/root/repo/target/scala-2.13/atacdataproductsspark_2.13-0.1.0.jar:/opt/spark/jars/*" \
  graft.StageTime "$@"
