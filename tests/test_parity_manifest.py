"""The checkpoint manifest is correct by construction (tiny scale).

scripts/parity/manifest.py tabulates the exact HF keys/shapes
checkpoint/convert.py consumes for the released TRACE checkpoints
(reference trace/model/builder.py:29-156 layouts).  The selfcheck
synthesizes a state dict from the manifest, converts it with key-access
recording, and compares the result to init_trace_params leaf-for-leaf.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_manifest_module():
    import importlib.util

    path = os.path.join(REPO, "scripts", "parity", "manifest.py")
    spec = importlib.util.spec_from_file_location("parity_manifest", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_manifest_selfcheck():
    _load_manifest_module().selfcheck()


def test_manifest_7b_totals(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/parity/manifest.py"),
         "--out", str(tmp_path)],
        capture_output=True, text=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert r.returncode == 0, r.stderr
    import json

    with open(tmp_path / "manifest_trace7b_merged.json") as f:
        doc = json.load(f)
    # Mistral-7B (7.24B incl. embed+lm_head at vocab 32000) + CLIP ViT-L/14
    # (0.303B) + projector/towers/heads — drift here means the architecture
    # tables changed and the runbook needs re-deriving
    assert doc["num_keys"] == 690
    assert 7.4e9 < doc["num_params"] < 7.7e9
    assert "model.layers.31.mlp.down_proj.weight" in doc["keys"]
    assert doc["keys"]["model.mm_projector.readout.weight"] == [4096, 1024]
