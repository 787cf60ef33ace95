#!/bin/bash
# Round-5 probe queue 2: s8dot decode-attention A/B + prefill sub-batch sweep.
cd /root/repo
set -u

echo "=== decode attention: s8dot vs dequant kernel (B=24, S=3072, int8) ==="
echo "--- s8dot (new) ---"
TRACE_TPU_DECODE_ATTN_S8=1 timeout 900 python benchmarks/attn_bw_probe.py \
    --b 24 --s 3072 --hpb 4 8 2>&1 | grep -v "^WARNING" | tail -2
echo "--- dequant (old) ---"
TRACE_TPU_DECODE_ATTN_S8=0 timeout 900 python benchmarks/attn_bw_probe.py \
    --b 24 --s 3072 --hpb 4 2>&1 | grep -v "^WARNING" | tail -1

echo "=== prefill sub-batch sweep (scan program, P=2560, B=24) ==="
TRACE_TPU_PREFILL_SCAN=1 timeout 2400 python benchmarks/prefill_probe.py \
    --batch 24 --prefix 2560 --sub-batches 3 4 6 --reps 3 2>&1 \
    | grep -v "^WARNING" | tail -6

echo "=== decode fuse probe with s8dot attention (B=24, S=3072, pb=4) ==="
TRACE_TPU_DECODE_ATTN_S8=1 timeout 1200 python benchmarks/decode_fuse_probe.py \
    --b 24 --s 3072 --prefill-batch 4 --modes fused 2>&1 | grep -v "^WARNING" | tail -2

echo "=== decode W8A8 (s8xs8 weight dots at T=1; r4 left this re-testable) ==="
echo "--- S=640 (comparable to the r4 1719 tok/s number) ---"
TRACE_TPU_DECODE_W8A8=1 TRACE_TPU_DECODE_ATTN_S8=1 timeout 1200 \
    python benchmarks/decode_fuse_probe.py --b 24 --modes fused 2>&1 \
    | grep -v "^WARNING" | tail -2
echo "--- S=3072 (real serving length) ---"
TRACE_TPU_DECODE_W8A8=1 TRACE_TPU_DECODE_ATTN_S8=1 timeout 1200 \
    python benchmarks/decode_fuse_probe.py --b 24 --s 3072 --prefill-batch 4 \
    --modes fused 2>&1 | grep -v "^WARNING" | tail -2
echo "=== probe queue 2 done ==="
