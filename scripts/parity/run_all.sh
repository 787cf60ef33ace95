#!/bin/bash
# One-command quality-parity run: weights dir -> manifest check ->
# logit parity -> event-triplet diff -> quality eval (bf16 + int8).
#
# Usage:
#   scripts/parity/run_all.sh /path/to/trace-ckpt \
#       [--vision /path/to/clip-vit-large-patch14-336] \
#       [--video demo.mp4] \
#       [--anno /path/to/youcook2 --videos /path/to/videos]   # enables eval
#
# Runs everything that is possible with what is present and reports a
# PASS/FAIL/SKIP line per stage, so a checkpoint drop costs hours, not a
# session (round-4 verdict item 9).  Stages:
#   0. manifest key/shape verification  (scripts/parity/manifest.py)
#   1. conversion + model_init smoke    (loader routes the layout)
#   2. logit-level parity vs torch HF   (gated tests, needs torch weights)
#   3. event-triplet diff bf16 vs int8  (needs --video; greedy decode)
#   4. quality eval at matched metrics  (needs --anno/--videos; bf16+int8)
set -u
cd "$(dirname "$0")/../.."

CKPT="${1:?usage: run_all.sh CKPT_DIR [--vision DIR] [--video FILE] [--anno DIR --videos DIR]}"
shift
VISION=""; VIDEO=""; ANNO=""; VIDEOS=""
while [ $# -gt 0 ]; do
  case "$1" in
    --vision) VISION="$2"; shift 2;;
    --video)  VIDEO="$2";  shift 2;;
    --anno)   ANNO="$2";   shift 2;;
    --videos) VIDEOS="$2"; shift 2;;
    *) echo "unknown arg: $1"; exit 2;;
  esac
done
VFLAG=""
[ -n "$VISION" ] && VFLAG="--vision-path $VISION"

status() { printf '%-28s %s\n' "$1" "$2"; }

echo "=== stage 0: manifest verification ==="
if python scripts/parity/manifest.py --verify "$CKPT"; then
  status "manifest" PASS
else
  status "manifest" "FAIL (layout mismatch — fix before proceeding)"
  exit 1
fi

echo "=== stage 1: conversion + model_init smoke ==="
if python - "$CKPT" "$VISION" <<'PY'; then
import sys
from trace_tpu.runtime.pipeline import model_init
pipe = model_init(sys.argv[1], vision_path=sys.argv[2] or None)
n = sum(x.size for x in __import__("jax").tree.leaves(pipe.params)
        if hasattr(x, "size"))
print(f"converted OK: {n/1e9:.2f}B params")
PY
  status "conversion" PASS
else
  status "conversion" FAIL; exit 1
fi

echo "=== stage 2: real-checkpoint gated tests (sanity + int8 margin) ==="
if TRACE_TPU_REAL_CKPT="$CKPT" TRACE_TPU_REAL_VISION="$VISION" \
      python -m pytest tests/test_real_checkpoint.py -q; then
  status "real-ckpt-tests" PASS
else
  status "real-ckpt-tests" FAIL
fi

echo "=== stage 3: event-triplet diff (bf16 vs int8 serving) ==="
if [ -n "$VIDEO" ]; then
  python - "$CKPT" "$VISION" "$VIDEO" <<'PY'
import json, sys
from trace_tpu.runtime.pipeline import model_init
Q = "Localize a series of activity events in the video, output the start " \
    "and end timestamp for each event, and describe each event with sentences."
outs = {}
for quant in ("bf16", "int8"):
    pipe = model_init(sys.argv[1], vision_path=sys.argv[2] or None, quant=quant)
    outs[quant] = pipe.infer_events(sys.argv[3], Q, max_new_tokens=512).to_dict()
    del pipe
same = outs["bf16"] == outs["int8"]
print(json.dumps({"identical": same, "bf16": outs["bf16"], "int8": outs["int8"]},
                 indent=2)[:4000])
PY
  status "triplet-diff" DONE
else
  status "triplet-diff" "SKIP (pass --video FILE)"
fi

echo "=== stage 4: quality eval (Youcook2 DVC, bf16 then int8) ==="
if [ -n "$ANNO" ] && [ -n "$VIDEOS" ]; then
  for q in bf16 int8; do
    python -m trace_tpu.eval.evaluate --task dvc --model-path "$CKPT" \
      --anno-path "$ANNO" --video-path "$VIDEOS" --split val \
      --batch-size 32 --quant "$q" --output-dir "parity_eval_$q" $VFLAG
  done
  status "quality-eval" "DONE (compare parity_eval_bf16 vs parity_eval_int8; accept int8 if CIDEr/METEOR/SODA_c/F1 move < 0.1 abs — BASELINE.md gate: 8.1/2.8/2.2/22.4)"
else
  status "quality-eval" "SKIP (pass --anno DIR --videos DIR)"
fi

echo "run_all complete."
