#!/bin/bash
# Round-11 task 3: give the four pair-density-bound keys a TRUE
# sf10<->sf100 plan diff + sf100 probes at realistic entity density.
# docMode=unique now de-clones the two relational axes (customer
# names, embedding vectors); rebuild ONLY those two tables in place
# at both octaves (ScaleUp's new `only` filter), then diff + probe.
set -u
cd /root/repo
OUT=/tmp/density_r11.log
: > "$OUT"
echo "=== rebuild sf10 customer+embeddings unique $(date -u +%H:%M:%S) ===" >> "$OUT"
timeout 3600 sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf10 100 100 unique customer,embeddings" >> "$OUT" 2>&1
echo "=== rebuild sf10 exit=$? ===" >> "$OUT"
echo "=== rebuild sf100 customer+embeddings unique $(date -u +%H:%M:%S) ===" >> "$OUT"
timeout 7200 sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf100 1000 1000 unique customer,embeddings" >> "$OUT" 2>&1
echo "=== rebuild sf100 exit=$? ===" >> "$OUT"
echo "=== plan diff sf10 vs sf100 $(date -u +%H:%M:%S) ===" >> "$OUT"
timeout 3600 sbt -batch "runMain graft.ScalePlanCheck /tmp/graft_sf10 /tmp/graft_sf100 fuzzy_entities,resolve_entities,jaccard_communities,semantic_dedup" >> "$OUT" 2>&1
echo "=== plan diff exit=$? ===" >> "$OUT"
for key in semantic_dedup resolve_entities fuzzy_entities jaccard_communities; do
  rm -rf /tmp/blockmgr-* /tmp/spark-local/* 2>/dev/null
  echo "=== probe $key start $(date -u +%H:%M:%S) df=$(df -BG --output=avail / | tail -1 | tr -d ' G')G ===" >> "$OUT"
  PROBE_SF=/tmp/graft_sf100 SPARK_DRIVER_MEM=96g \
    SPARK_GRAFT_FIXTURE_CACHE=off \
    SPARK_GRAFT_JAVA_OPTS="-Dspark.io.compression.codec=zstd" \
    timeout 3600 sbt -batch "runMain graft.Probe $key $key" >> "$OUT" 2>&1
  echo "=== probe $key exit=$? $(date -u +%H:%M:%S) df=$(df -BG --output=avail / | tail -1 | tr -d ' G')G ===" >> "$OUT"
done
echo "ALL DONE" >> "$OUT"
