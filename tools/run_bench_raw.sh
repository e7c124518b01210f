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
# Env: GRAFT_CLASSES (classpath snapshot), SPARK_DRIVER_MEM (-Xmx, default
# 8g), GRAFT_EXTRA_JAVA_OPTS (e.g. -Xlog:gc:...), plus every SPARK_GRAFT_*
# knob the mains read. Args: main class (optional if graft.Bench) + its args.
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
  -cp "${GRAFT_CLASSES:-/tmp/bench_classes}:/opt/spark/jars/*" \
  "$@"
