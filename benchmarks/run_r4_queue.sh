#!/bin/bash
# Round-4 TPU validation queue — run serially on a healthy tunnel.
# Prereq learned 2026-08-18: stage order matters less than window quality;
# every stage logs to /tmp/r4q_*.log and tolerates individual failure.
cd /root/repo
set -u

echo "=== stage 0: quant_matmul_p4 Mosaic compile probe ==="
timeout 900 python benchmarks/qmm_p4_probe.py > /tmp/r4q_p4probe.log 2>&1
grep -v "^WARNING" /tmp/r4q_p4probe.log | tail -4

echo "=== stage 1: int4p e2e (W4A8 prefill, b32 shared budget) ==="
timeout 2400 python bench.py --quant int4p > /tmp/r4q_int4p.log 2>&1
grep -v "^WARNING" /tmp/r4q_int4p.log | tail -2

echo "=== stage 2: streamed e2e (frame-pool fix) ==="
TRACE_TPU_BENCH_STALL_SEC=1800 timeout 3600 python bench.py \
    --streamed --videos 3 > /tmp/r4q_streamed.log 2>&1
grep -v "^WARNING" /tmp/r4q_streamed.log | tail -2

echo "=== stage 3: streamed + int4p ==="
TRACE_TPU_BENCH_STALL_SEC=1800 timeout 3600 python bench.py \
    --streamed --quant int4p --videos 3 > /tmp/r4q_streamed_i4.log 2>&1
grep -v "^WARNING" /tmp/r4q_streamed_i4.log | tail -2

echo "=== stage 4: e2e with W8A8 ViT (btd kernel; isolated 525 f/s) ==="
timeout 2400 python bench.py --vit int8 > /tmp/r4q_vit8_e2e.log 2>&1
grep -v "^WARNING" /tmp/r4q_vit8_e2e.log | tail -2

echo "=== stage 5: 7B int4p margin-aware divergence ==="
timeout 2400 python benchmarks/quant_divergence.py --phase int4p \
    > /tmp/r4q_diverge.log 2>&1
grep -v "^WARNING" /tmp/r4q_diverge.log | tail -6

echo "=== queue done ==="
