#!/bin/bash
# Multi-JVM correctness replay: run a graft main (default graft.Verify)
# under local-cluster — REAL executor processes, real closure/Kryo
# serialization, real network shuffle. local[(n)] shares one JVM and so
# can never catch a closure-capture or executor-classpath bug; this is
# the closest a single box gets to a 1000-executor deployment.
#
#   tools/run_local_cluster.sh /root/testdata/sf0.01 /tmp/vout_cluster [names...]
#   GRAFT_MAIN=graft.Bench tools/run_local_cluster.sh   (Bench reads env)
#
# Executors: 4 JVMs x 8 cores x 6 GiB (override via GRAFT_CLUSTER).
set -euo pipefail

CLASSES=/root/repo/target/scala-2.13/classes
export SPARK_HOME=/opt/spark
# the launcher's executor-command builder asks for this when the dist has
# no launcher/target build dirs (jar-only layout)
export SPARK_SCALA_VERSION=2.13
export SPARK_GRAFT_MASTER="${GRAFT_CLUSTER:-local-cluster[4,8,6144]}"
export SPARK_GRAFT_EXECUTOR_CP="$CLASSES"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

exec java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" \
  "${GRAFT_MAIN:-graft.Verify}" "$@"
