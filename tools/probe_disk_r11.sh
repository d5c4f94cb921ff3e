#!/bin/bash
# Round-11 opportunistic re-probes: bloom_index and adamic_adar died
# in the r10 rehearsal at ~45-48 GB of lz4 local spill on this box's
# ~47 GB free disk — zstd spill/shuffle compression (~2x on these
# shapes) may fit them, converting two disk-bound capacity rows into
# measured completions. Fresh JVM per key, df sampled for peak draw.
set -u
cd /root/repo
OUT=/tmp/probe_disk_r11.log
DF=/tmp/probe_disk_r11_df.log
: > "$OUT"; : > "$DF"
( while true; do
    echo "$(date -u +%H:%M:%S) avail=$(df -BG --output=avail / | tail -1 | tr -d ' G')G" >> "$DF"
    sleep 10
  done ) &
SAMPLER=$!
for key in bloom_index adamic_adar; do
  rm -rf /tmp/blockmgr-* /tmp/spark-local/* 2>/dev/null
  echo "=== $key start $(date -u +%H:%M:%S) df=$(df -BG --output=avail / | tail -1 | tr -d ' G')G ===" >> "$OUT"
  PROBE_SF=/tmp/graft_sf100 SPARK_DRIVER_MEM=96g \
    SPARK_GRAFT_FIXTURE_CACHE=off \
    SPARK_GRAFT_JAVA_OPTS="-Dspark.io.compression.codec=zstd" \
    timeout 5400 sbt -batch "runMain graft.Probe $key $key" >> "$OUT" 2>&1
  echo "=== $key exit=$? $(date -u +%H:%M:%S) df=$(df -BG --output=avail / | tail -1 | tr -d ' G')G ===" >> "$OUT"
done
kill $SAMPLER 2>/dev/null
echo "ALL DONE" >> "$OUT"
