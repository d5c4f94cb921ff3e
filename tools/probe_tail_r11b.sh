#!/bin/bash
# Round-11 sf100 probe tail, attempt 2: zstd shuffle/spill compression
# (trades CPU for spill disk — text-heavy corpus-assembly shuffles
# compress ~2x better than lz4). Fresh JVM per key, df sampled every
# 10 s so a no-space failure carries a measured peak-draw figure.
set -u
cd /root/repo
OUT=/tmp/probe_tail_r11b.log
DF=/tmp/probe_tail_r11b_df.log
: > "$OUT"; : > "$DF"
( while true; do
    echo "$(date -u +%H:%M:%S) avail=$(df -BG --output=avail / | tail -1 | tr -d ' G')G" >> "$DF"
    sleep 10
  done ) &
SAMPLER=$!
for key in webhook_item_status publish_split_bib marc_build; do
  rm -rf /tmp/blockmgr-* /tmp/spark-local/* 2>/dev/null
  echo "=== $key start $(date -u +%H:%M:%S) df=$(df -BG --output=avail / | tail -1 | tr -d ' G')G ===" >> "$OUT"
  echo "=== $key start ===" >> "$DF"
  PROBE_SF=/tmp/graft_sf100 SPARK_DRIVER_MEM=96g \
    SPARK_GRAFT_JAVA_OPTS="-Dspark.io.compression.codec=zstd" \
    timeout 3600 sbt -batch "runMain graft.Probe $key $key" >> "$OUT" 2>&1
  echo "=== $key exit=$? $(date -u +%H:%M:%S) df=$(df -BG --output=avail / | tail -1 | tr -d ' G')G ===" >> "$OUT"
done
kill $SAMPLER 2>/dev/null
echo "ALL DONE" >> "$OUT"
