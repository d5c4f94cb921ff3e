#!/bin/bash
# Round-11 sf100 probe tail (verdict item 1): re-measure the three
# corpus-assembly keys to completion on the idle box. Fresh JVM per
# key, each key run twice (cold+warm), spills cleaned between keys.
set -u
cd /root/repo
OUT=/tmp/probe_tail_r11.log
: > "$OUT"
for key in webhook_item_status publish_split_bib marc_build; do
  rm -rf /tmp/blockmgr-* /tmp/spark-local/* /tmp/spark-*[0-9a-f]/ 2>/dev/null
  echo "=== $key start $(date -u +%H:%M:%S) df=$(df -BG --output=avail / | tail -1 | tr -d ' G')G ===" >> "$OUT"
  PROBE_SF=/tmp/graft_sf100 SPARK_DRIVER_MEM=96g \
    timeout 3600 sbt -batch "runMain graft.Probe $key $key" >> "$OUT" 2>&1
  echo "=== $key exit=$? $(date -u +%H:%M:%S) df=$(df -BG --output=avail / | tail -1 | tr -d ' G')G ===" >> "$OUT"
done
echo "ALL DONE" >> "$OUT"
