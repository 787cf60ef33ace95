#!/bin/bash
# Quant-quality hedge measurements (VERDICT r2 item 4): throughput of the
# intermediate precision configs + the 7B divergence curves.  One TPU
# process at a time; run from repo root.
set -x
cd /root/repo
mkdir -p benchmarks/_hedge

echo "=== int8 weights + bf16 KV, decode batch 16"
timeout 2400 python bench.py --quant int8 --kv bf16 --batch 16 \
  2>&1 | grep -v "^WARNING:20" | tail -3 | tee benchmarks/_hedge/int8_bf16kv.log

echo "=== bf16 weights + int8 KV (quality config, batch auto-capped 2)"
TRACE_TPU_BENCH_512=0 timeout 2400 python bench.py --quant bf16 --kv int8 \
  2>&1 | grep -v "^WARNING:20" | tail -3 | tee benchmarks/_hedge/bf16_int8kv.log

echo "=== divergence: bf16 phase"
timeout 2400 python benchmarks/quant_divergence.py --phase bf16 \
  2>&1 | grep -v "^WARNING:20" | tail -4
echo "=== divergence: int8 phase"
timeout 2400 python benchmarks/quant_divergence.py --phase int8 \
  2>&1 | grep -v "^WARNING:20" | tail -4
echo "=== divergence report"
python benchmarks/quant_divergence.py --report | tee benchmarks/_hedge/divergence.json
echo all done
