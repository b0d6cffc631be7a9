#!/bin/bash
# Round 2 of the local[32] sweep: task-cpus sizing (each Arrow-stage task
# = 1 JVM feed thread + 1 python worker ~= 2 cores).
cd /root/repo
export SPARK_GRAFT_REPLICAS=256 SPARK_GRAFT_BUILD_TRIALS=1 SPARK_GRAFT_EXTRAS=0
run () {
  local tag=$1 cores=$2 conf=${3:-'{}'}
  echo "=== $tag (cores=$cores conf=$conf)" >&2
  SPARK_GRAFT_SPARK_CONF="$conf" python bench.py --cores "$cores" --json-only --repeats 1 \
    | grep '^{' | tail -1 \
    | python3 -c "
import json,sys
r=json.load(sys.stdin); d=r['detail']; t=d['build_trials'][0]
print(json.dumps({'tag':'$tag','docs_per_sec':d['build_docs_per_sec'],
 'phases':t['phases'],'cpu':t['cpu'],'batch':d['query_batch_all_sec']}))"
}
run c32_taskcpus2 32 '{"spark.task.cpus":"2"}'
run c32_taskcpus2_shuf128 32 '{"spark.task.cpus":"2","spark.sql.shuffle.partitions":"128"}'
run c8_taskcpus2 8 '{"spark.task.cpus":"2"}'
