#!/bin/bash
# sf10 soak bench runner: detached java, outputs under target/
cd /root/repo
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_GRAFT_SF_DIR=/root/repo/target/soak_sf10
export SPARK_GRAFT_BENCH_OUT=/root/repo/target/BENCH_sf10b_raw.json
java $ADD_OPENS -Xmx48g \
  -Dlog4j2.configurationFile=file:///root/repo/tools/log4j2-soak.properties \
  -Dspark.ui.enabled=false \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
  > target/bench_sf10b_stdout.txt 2> target/bench_sf10b_stderr.txt
echo "exit=$?" > target/bench_sf10b_exit.txt
