#!/bin/bash
# Replica decomposition experiment:
#   solo:  1x local[2] pinned to cores 0-1
#   quad:  4x INDEPENDENT local[2] pinned to cores 0-1,2-3,4-5,6-7
# Independent processes share no JVM/driver/engine state, so any
# per-replica CPU inflation in the quad leg is pure hardware
# (memory-bandwidth/cache) contention -- the same cores-per-job,
# the same work, only neighbors differ.
set -eu
cd /root/repo
export SPARK_GRAFT_ROUTES=50000
export SPARK_GRAFT_SKIP_SUITE=1
export SPARK_GRAFT_GEO_TRIALS=2
export SPARK_GRAFT_CPUS=2
export SPARK_GRAFT_DRIVER_MEM=20g

# stale results from a previous run must not leak into the cat below
rm -f /tmp/replica_solo.json /tmp/replica_quad_*.json

# pre-generate the shared pages-cache parquet at full parallelism so
# the four concurrent replicas never race on writing it (overwrite
# mode racing corrupts both the cache and the measurement)
SPARK_GRAFT_GEN_ONLY=1 python bench.py > /dev/null 2>&1

echo "== solo =="
taskset -c 0-1 python bench.py 2>/dev/null | tail -1 | tee /tmp/replica_solo.json

echo "== quad =="
for i in 0 1 2 3; do
  c0=$((2*i)); c1=$((2*i+1))
  taskset -c ${c0}-${c1} python bench.py 2>/dev/null | tail -1 > /tmp/replica_quad_$i.json &
done
wait
cat /tmp/replica_quad_*.json
