#!/bin/bash
# Round-5 judged-scale measurement chain.
cd /root/repo
set -x
# 1. design-C judged bench: single 256 block, stepped bf16 push, full walk
FORA_BENCH_NLOG2=22 FORA_BENCH_QUERIES=512 FORA_BENCH_POOL=256 \
FORA_BENCH_BATCH=256 FORA_BENCH_BF16=1 FORA_BENCH_CHUNK=19 \
timeout 7000 python bench.py \
  > bench_r5_judgedC.json.out 2> bench_r5_judgedC.log
rc=$?
echo "exit=$rc" >> bench_r5_judgedC.log
if [ ! -s bench_r5_judgedC.json.out ]; then
  # fallback: B=192 (design D) — comfortably inside HBM
  FORA_BENCH_NLOG2=22 FORA_BENCH_QUERIES=576 FORA_BENCH_POOL=192 \
  FORA_BENCH_BATCH=192 FORA_BENCH_BF16=1 FORA_BENCH_CHUNK=19 \
  timeout 7000 python bench.py \
    > bench_r5_judgedD.json.out 2> bench_r5_judgedD.log
  echo "exit=$?" >> bench_r5_judgedD.log
fi
# 2. fresh index-build timing with the native pack (directive 3)
timeout 3000 python scripts/time_index_build.py --nlog2 22 \
  --out BUILD_r05.json > build_r05.log 2>&1
echo "exit=$?" >> build_r05.log
echo ALL-DONE > judged_r5.done
