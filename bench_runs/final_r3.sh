#!/bin/bash
# Final round-3 measurements (post builder serial-job merge), quiet box.
cd /root/repo
set -x
SPARK_GRAFT_SCALING_CORES=8,32 SPARK_GRAFT_SCALING_TRIALS=3 \
  python bench.py --scaling 2>/dev/null | grep '^{' | tail -1 \
  > bench_runs/r3_scaling_8v32_final.json
SPARK_GRAFT_SCALING_CORES=2,8 SPARK_GRAFT_SCALING_TRIALS=3 \
  python bench.py --scaling 2>/dev/null | grep '^{' | tail -1 \
  > bench_runs/r3_scaling_2v8_final.json
python bench.py 2>/dev/null | grep '^{' | tail -1 \
  > bench_runs/r3_default_final3.json
