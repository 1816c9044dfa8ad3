#!/bin/bash
# Round-5 final measurement chain (after the width-lever retirement).
cd /root/repo
set -x
# 0. finish the knob sweep if still running is handled by caller ordering
# 1. relay compiler memory accounting (for the ARCHITECTURE note)
timeout 2500 python /tmp/relay_memaudit.py > relay_memaudit.log 2>&1
# 2. final judged bench: lean kernel at the r4 config shape
FORA_BENCH_NLOG2=22 FORA_BENCH_QUERIES=512 FORA_BENCH_POOL=128 \
FORA_BENCH_BATCH=128 FORA_BENCH_CHUNK=21 FORA_BENCH_STEPPED=0 \
timeout 7000 python bench.py \
  > bench_r5_judged_final.json.out 2> bench_r5_judged_final.log
echo "exit=$?" >> bench_r5_judged_final.log
# 3. serve frontier at judged scale (directive 2)
FORA_BENCH_NLOG2=22 FORA_BENCH_CHUNK=21 FORA_BENCH_STEPPED=0 \
timeout 7000 python scripts/serve_frontier.py \
  --rates 2,5,8,11 --batches 32,64,128 --window 90 \
  --out SERVE_r05.json > serve_r05.log 2>&1
echo "exit=$?" >> serve_r05.log
# 4. weighted bench-scale row (directive 4)
FORA_BENCH_NLOG2=19 FORA_BENCH_WEIGHTED=1 FORA_BENCH_QUERIES=512 \
FORA_BENCH_POOL=256 FORA_BENCH_BATCH=256 FORA_BENCH_BF16=1 \
FORA_BENCH_CHUNK=20 timeout 7000 python bench.py \
  > bench_r5_weighted19.json.out 2> bench_r5_weighted19.log
echo "exit=$?" >> bench_r5_weighted19.log
echo ALL-DONE > final_r5.done
