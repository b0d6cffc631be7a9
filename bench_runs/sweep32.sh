#!/bin/bash
# One-pass config sweep to localize the local[32] build falloff at 1.28M docs.
cd /root/repo
export SPARK_GRAFT_REPLICAS=256 SPARK_GRAFT_BUILD_TRIALS=1 SPARK_GRAFT_EXTRAS=0
run () {  # run <tag> <cores> [conf-json]
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
run c8_base 8
run c32_base 32
run c32_bigarrow 32 '{"spark.sql.execution.arrow.maxRecordsPerBatch":"32768"}'
run c32_parallelgc 32 '{"spark.driver.extraJavaOptions":"-XX:+UseParallelGC"}'
run c32_shuf128 32 '{"spark.sql.shuffle.partitions":"128"}'
run c16_base 16
