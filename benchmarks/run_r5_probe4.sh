#!/bin/bash
# Round-5 probe queue 4: quality re-pins after the session-4 serving wins.
#  - int8 (fused serving layout) teacher-forced agreement vs the re-pinned
#    bf16 stream (stacked-softmax attention default)
#  - int4p with group-128 scales at 7B: the fix for the r4 per-channel
#    absmax collapse (0.3% agreement); expect int8-class agreement structure
cd /root/repo
set -u

echo "=== 7B int8 fused re-pin (vs stacked-softmax bf16 stream) ==="
timeout 3600 python benchmarks/quant_divergence.py --phase int8 --fused \
    2>&1 | grep -v "^WARNING" | tail -6

echo "=== 7B int4p group-128 re-probe ==="
timeout 3600 python benchmarks/quant_divergence.py --phase int4p --group 128 \
    2>&1 | grep -v "^WARNING" | tail -6

echo "=== report ==="
timeout 600 python benchmarks/quant_divergence.py --report 2>&1 | grep -v "^WARNING" | tail -30
echo "=== probe queue 4 done ==="
