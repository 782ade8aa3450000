#!/bin/bash
# Re-dump the neardup stream twins at sf10 on the fixed (admission-gated) build.
cd /root/repo
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
java $ADD_OPENS -Xmx48g \
  -Dlog4j2.configurationFile=file:///root/repo/tools/log4j2-soak.properties \
  -Dspark.ui.enabled=false \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Verify \
  /root/repo/target/soak_sf10 /root/repo/target/vout_sf10_r11 \
  stream_neardup_twin stream_neardup_rocks \
  > target/verify_sf10_neardup2_stdout.txt 2> target/verify_sf10_neardup2_stderr.txt
echo "exit=$?" > target/verify_sf10_neardup2_exit.txt
