#!/bin/bash
# Round-5 probe queue 1: decode unroll sweep + prefill scan-vs-loop.
cd /root/repo
set -u

echo "=== prefill: single-program scan vs dispatch loop (pb=2, P=2560, B=24) ==="
echo "--- scan (new default) ---"
TRACE_TPU_PREFILL_SCAN=1 timeout 900 python benchmarks/prefill_probe.py \
    --batch 24 --prefix 2560 --sub-batches 2 --reps 4 2>&1 | grep -v "^WARNING" | tail -3
echo "--- dispatch loop (old) ---"
TRACE_TPU_PREFILL_SCAN=0 timeout 900 python benchmarks/prefill_probe.py \
    --batch 24 --prefix 2560 --sub-batches 2 --reps 4 2>&1 | grep -v "^WARNING" | tail -3

echo "=== decode unroll sweep (int8 fused, B=24, S=640) ==="
for u in 1 2 4; do
  echo "--- unroll=$u ---"
  TRACE_TPU_DECODE_UNROLL=$u timeout 900 python benchmarks/decode_fuse_probe.py \
      --b 24 --modes fused 2>&1 | grep -v "^WARNING" | tail -2
done

echo "=== decode at REAL serving cache len (S=3072, pb=4) ==="
for u in 1 2; do
  echo "--- unroll=$u ---"
  TRACE_TPU_DECODE_UNROLL=$u timeout 1200 python benchmarks/decode_fuse_probe.py \
      --b 24 --s 3072 --prefill-batch 4 --modes fused 2>&1 | grep -v "^WARNING" | tail -2
done
echo "=== probe queue 1 done ==="
