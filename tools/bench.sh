#!/bin/sh
# Driver-friendly bench invocation (r12; r11 verdict item 2).
#
# The bench's stdout contract is three bare JSON lines (compact, full,
# compact). Invoked as `sbt "runMain graft.Bench"` at the default log
# level, sbt's logger used to decorate every forked-process line with
# an "[info] " prefix, which broke the driver's JSON parser two rounds
# running (PERF_r10/r11: parsed=null). Two fixes compose:
#   - build.sbt sets `run / outputStrategy := StdoutOutput`, so the
#     forked JVM's stdout passes through undecorated at ANY log level;
#   - this wrapper additionally runs sbt at --error so no sbt status
#     lines interleave with the JSON.
# Environment: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as before. The
# full per-query map is ALSO written to bench_perquery_c${CPUS}.json
# (keyed by core count so a scaling run can't clobber the main map).
exec sbt --error -batch "runMain graft.Bench" "$@"
