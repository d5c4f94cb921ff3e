#!/bin/bash
# Round-11 sf100 probe tail, attempt 3: SPARK_GRAFT_FIXTURE_CACHE=off.
# Attempts 1 (lz4) and 2 (zstd) both died on one box's ~47 GB of free
# disk — and the measured draw was CORPUS-FIXTURE CACHE spill (the
# MEMORY_AND_DISK persist that amortizes the synthesized corpus across
# a 290-key bench pass), not operator shuffle. A single-key probe reads
# the corpus once, so this run measures the operator's one-pass
# streaming path — the shape a production ingest (reading real payload
# files, not synthesizing them) would run. zstd kept for spill headroom.
set -u
cd /root/repo
OUT=/tmp/probe_tail_r11c.log
DF=/tmp/probe_tail_r11c_df.log
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
    SPARK_GRAFT_FIXTURE_CACHE=off \
    SPARK_GRAFT_JAVA_OPTS="-Dspark.io.compression.codec=zstd" \
    timeout 3600 sbt -batch "runMain graft.Probe $key $key" >> "$OUT" 2>&1
  echo "=== $key exit=$? $(date -u +%H:%M:%S) df=$(df -BG --output=avail / | tail -1 | tr -d ' G')G ===" >> "$OUT"
done
kill $SAMPLER 2>/dev/null
echo "ALL DONE" >> "$OUT"
