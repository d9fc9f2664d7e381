#!/usr/bin/env bash
# Dump the formatted physical plan of one registry gate to stdout via
# graft.tools.Profile (reps=1 run + explain), using the compiled classes
# directly — no sbt in the loop, safe to run beside a long sbt session.
set -euo pipefail
cd "$(dirname "$0")/.."
Q="$1"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
CLASSES=target/scala-2.13/classes
[ -d "$CLASSES" ] || { echo "no $CLASSES — run: sbt -batch compile" >&2; exit 1; }
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
java $ADD_OPENS -Xmx8g -Dspark.ui.enabled=false \
     -Dspark.sql.session.timeZone=UTC \
     -cp "$CLASSES:/opt/spark/jars/*" graft.tools.Profile "$Q" "$SF_DIR" 1 plan 2>/dev/null
