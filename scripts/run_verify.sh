#!/usr/bin/env bash
# Run graft.Verify against an sf dir, outside sbt (no logger prefixes,
# no sbt JVM between Spark and the OS). Usage:
#   scripts/run_verify.sh <sf_dir> <out_dir> [name_prefix] [cpus] [heap]
set -euo pipefail
SF_DIR="$1"; OUT_DIR="$2"; PREFIX="${3:-}"; CPUS="${4:-32}"; HEAP="${5:-96g}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ADD_OPENS=()
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
SPARK_GRAFT_CPUS="$CPUS" exec java "${ADD_OPENS[@]}" \
  -Xmx"$HEAP" -XX:ReservedCodeCacheSize=512m \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$REPO/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF_DIR" "$OUT_DIR" ${PREFIX:+"$PREFIX"}
