#!/bin/bash
# Round-3 session-2 TPU validation queue — run serially on a healthy tunnel.
# Each stage logs to /tmp/r3q_*.log; stages tolerate individual failure.
cd /root/repo
set -u

echo "=== stage 1: streamed e2e (72 videos) ==="
TRACE_TPU_BENCH_STALL_SEC=1800 timeout 3600 python bench.py \
    --streamed --videos 3 > /tmp/r3q_streamed.log 2>&1
tail -3 /tmp/r3q_streamed.log | grep -v WARNING

echo "=== stage 2: int8 ViT isolated re-test (btd kernel) ==="
timeout 1500 python benchmarks/vit_ablate.py --vit-int8 --only full \
    > /tmp/r3q_vit8.log 2>&1
grep -v "WARNING\|WARN\|INFO" /tmp/r3q_vit8.log | head -4

echo "=== stage 3: int4p decode bench ==="
TRACE_TPU_BENCH_512=0 timeout 2400 python bench.py --quant int4p \
    > /tmp/r3q_int4p.log 2>&1
tail -2 /tmp/r3q_int4p.log | grep -v WARNING

echo "=== stage 4: default-config run (headline) ==="
timeout 2400 python bench.py > /tmp/r3q_default.log 2>&1
tail -2 /tmp/r3q_default.log | grep -v WARNING

echo "=== queue done ==="
