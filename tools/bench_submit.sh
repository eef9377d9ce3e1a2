#!/usr/bin/env bash
# Run a graft main (default graft.Bench) via spark-submit against the
# thin `sbt package` jar — the sbt-decoupled bench path (r16 VERDICT
# ask #2): sbt runs only to (re)package BEFORE the timed JVM starts,
# then exits; nothing but the measured JVM is alive during the run.
# spark-submit injects the JDK17 --add-opens set itself, so this path
# needs none of the build.sbt javaOptions plumbing.
#
# Usage:
#   tools/bench_submit.sh                      # graft.Bench
#   tools/bench_submit.sh graft.Verify <sfDir> <outDir>
# Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_DRIVER_MEM,
#      GRAFT_BENCH_SEAL, SKIP_PACKAGE=1 to trust the existing jar.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
MAIN="${1:-graft.Bench}"
[ $# -gt 0 ] && shift
if [ "${SKIP_PACKAGE:-0}" != "1" ]; then
  echo "[bench_submit] sbt package (pre-timing; sbt exits before the run)..." >&2
  sbt -batch package 1>&2
fi
# main-classes jar only — `sbt package` also leaves a *-tests.jar
# beside it that must never win the newest-first pick
JAR=$(ls -t "$REPO"/target/scala-2.13/feldmanspark_2.13-*.jar \
      | grep -v -- '-tests\.jar' | head -1)
CPUS="${SPARK_GRAFT_CPUS:-32}"
exec /opt/spark/bin/spark-submit \
  --class "$MAIN" \
  --master "local[$CPUS]" \
  --driver-memory "${SPARK_DRIVER_MEM:-24g}" \
  --conf spark.ui.enabled=false \
  --conf spark.sql.session.timeZone=UTC \
  "$JAR" "$@"
