#!/usr/bin/env bash
# Perf sweep driver — the run_performance_tests.sh analog
# (reference: script/run_performance_tests.sh:34-40 + profile_gemm.sh
# shape sets + profile_mixed_gemm.sh decode shapes).
# Runs ckprof across the QA shape sets; on TPU this is the regression
# suite whose best-instance lines land in perf logs for tracking.
set -e
cd "$(dirname "$0")/.."

echo "=== standard GEMM shapes (profile_gemm.sh analog) ==="
for mnk in "3840 4096 4096" "960 1024 1024" "1920 2048 2048" "7680 8192 8192"; do
  set -- $mnk
  python ckprof gemm -m $1 -n $2 -k $3 --dtype bf16
done

echo "=== weight-only quant GEMM (north star) ==="
python ckprof wo_quant_gemm --wdtype i4 --group 128 -m 3840 -n 4096 -k 4096
python ckprof wo_quant_gemm --wdtype i8 -m 3840 -n 4096 -k 4096

echo "=== decode/mixed shapes (profile_mixed_gemm.sh analog) ==="
for m in 8 16 64; do
  python ckprof wo_quant_gemm --wdtype i4 --group 128 -m $m -n 14336 -k 4096
done
python ckprof wo_quant_gemm --wdtype i8 -m 16 -n 2048 -k 65536

echo "=== attention ==="
python ckprof attention --batch 2 --heads 32 --kv-heads 8 -m 2048 -n 2048 -k 128 --causal

echo "=== normalization ==="
python ckprof layernorm -m 4096 -n 4096
python ckprof softmax -m 4096 -n 4096
