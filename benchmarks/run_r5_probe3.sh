#!/bin/bash
# Round-5 probe queue 3: stacked-softmax decode-attention A/B + in-context step.
cd /root/repo
set -u

echo "=== decode attention: stacked (S8=2) vs per-head (S8=1), B=24 S=3072 int8 ==="
for mode in 2 1; do
  echo "--- S8=$mode ---"
  TRACE_TPU_DECODE_ATTN_S8=$mode timeout 900 python benchmarks/attn_bw_probe.py \
      --b 24 --s 3072 --hpb 4 8 2>&1 | grep -v "^WARNING" | tail -2
done

echo "=== decode fuse probe with stacked attention (B=24, S=3072, pb=4) ==="
TRACE_TPU_DECODE_ATTN_S8=2 timeout 1800 python benchmarks/decode_fuse_probe.py \
    --b 24 --s 3072 --prefill-batch 2 --modes fused 2>&1 | grep -v "^WARNING" | tail -2
echo "=== probe queue 3 done ==="

echo "=== prefill sub-batch sweep retry (scan, P=2560, B=24, quiet chip) ==="
sleep 10
TRACE_TPU_PREFILL_SCAN=1 timeout 2400 python benchmarks/prefill_probe.py \
    --batch 24 --prefix 2560 --sub-batches 3 4 --reps 3 2>&1 \
    | grep -v "^WARNING" | tail -5
echo "=== probe queue 3 done ==="
