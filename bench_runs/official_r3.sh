#!/bin/bash
# Official round-3 scaling + default artifacts with the 2-core task sizing.
cd /root/repo
set -x
SPARK_GRAFT_SCALING_CORES=2,8 SPARK_GRAFT_SCALING_TRIALS=2 \
  python bench.py --scaling 2>/dev/null | grep '^{' | tail -1 \
  > bench_runs/r3_scaling_2v8_taskcpus2.json
SPARK_GRAFT_SCALING_CORES=8,32 SPARK_GRAFT_SCALING_TRIALS=2 \
  python bench.py --scaling 2>/dev/null | grep '^{' | tail -1 \
  > bench_runs/r3_scaling_8v32_taskcpus2.json
python bench.py 2>/dev/null | grep '^{' | tail -1 \
  > bench_runs/r3_default_taskcpus2.json
