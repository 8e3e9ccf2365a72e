#!/bin/bash
# Regenerate PLANS.md (formatted physical plans of headline queries).
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS -Xmx4g \
  -cp "/root/repo/target/scala-2.13/atacdataproductsspark_2.13-0.1.0.jar:/opt/spark/jars/*" \
  graft.PlanDump "${1:-/root/testdata/sf0.001}" "${2:-/root/repo/PLANS.md}"
