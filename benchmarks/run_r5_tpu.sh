#!/bin/bash
# Round-5 TPU measurement batch — run ONLY when the chip is free
# (single-process rule: see memory/tpu-tunnel-pitfalls).  Each block
# logs to its own file and the script continues on failure so one
# wedged compile doesn't lose the batch.
set -x
cd /root/repo

# 1. medical class: champion stats receipts + fractional-factor sweep
timeout 3600 python benchmarks/micro_medical2.py \
  --only b8+minw64+q4 f15 f133 \
  --out benchmarks/results_medical2_r5.json \
  > /tmp/medical_r5.log 2>&1

# 2. fwd+bwd north-star with the cascaded replay (1024^3, 512^2 x 1)
timeout 3600 python benchmarks/bench_1024.py --no-fwd --bwd \
  --bwd-res 512 --bwd-spp 1 \
  > /tmp/b1024_bwd_cascade.log 2>&1

# 3. 1024^3 forward majorant-quality sweep (max_bricks granularity)
for mb in 8192 65536 524288; do
  timeout 2400 python benchmarks/bench_1024.py --iters 4 \
    --table-bits 4 --max-bricks $mb \
    > /tmp/b1024_mb${mb}.log 2>&1
done

# 4. config 3 target derivation + sweep
timeout 3600 python benchmarks/micro_config3.py \
  --out benchmarks/results_config3.json \
  > /tmp/config3_r5.log 2>&1

# 5. scaling: sharded-vs-plain dispatch overhead on the real chip
timeout 1800 python benchmarks/scaling_efficiency.py --compare-plain \
  --json-out benchmarks/results_scaling_tpu.json \
  > /tmp/scaling_tpu.log 2>&1

echo BATCH DONE
