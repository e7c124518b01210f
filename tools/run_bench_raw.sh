#!/bin/bash
# Raw-java launcher for graft mains (default graft.Bench) — avoids the sbt
# project lock so tests/compiles can proceed while long sweeps run.
#
# DISCIPLINE: point GRAFT_CLASSES at a FROZEN SNAPSHOT of
# target/scala-2.13/classes (cp -r after a committed compile), never the
# live dir — an sbt compile mid-sweep mutates class/resource files under a
# running JVM (r16: a half-visible META-INF/services file failed 80 queries
# of a floor sweep before this rule).
#
# Env: GRAFT_CLASSES (classpath snapshot; defaults to the repo-local
# target/bench_classes_snapshot — never a world-writable /tmp path, where
# another local user could plant classes the bench JVM would execute),
# SPARK_DRIVER_MEM (-Xmx, default 8g), GRAFT_EXTRA_JAVA_OPTS (e.g.
# -Xlog:gc:...), plus every SPARK_GRAFT_* knob the mains read.
# Args: main class (optional if graft.Bench) + its args.
REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
CLASSES="${GRAFT_CLASSES:-$REPO_ROOT/target/bench_classes_snapshot}"
if [ ! -d "$CLASSES" ]; then
  echo "run_bench_raw.sh: classpath snapshot '$CLASSES' does not exist —" >&2
  echo "  cp -r target/scala-2.13/classes \"$CLASSES\" after a committed compile" >&2
  exit 2
fi
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
case "${1:-}" in graft.*) : ;; *) set -- graft.Bench "$@" ;; esac
exec java $ADDOPENS ${GRAFT_EXTRA_JAVA_OPTS:-} -Xmx${SPARK_DRIVER_MEM:-8g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" \
  "$@"
