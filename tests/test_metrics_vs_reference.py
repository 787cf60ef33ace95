"""Numerical cross-validation of trace_tpu.metrics against the reference's
own metric scripts, executed in subprocesses out of /root/reference.

The reference metric layer (eval_tvg.py, eval_vhd.py, eval_dvc.py + the
vendored CIDEr/SODA) is pure Python/numpy/sklearn and runs in this
environment on synthetic prediction/GT data — no weights or Java jars
needed for IoU/R@K/mAP/F1/CIDEr/SODA_c.  These tests pin seeded synthetic
inputs on both sides and assert numeric agreement, converting the "same
math" claim into measured fact (METEOR-dependent terms excluded: the jar
is a missing blob in the reference checkout too).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile

import numpy as np
import pytest

REF_METRICS = "/root/reference/trace/metrics"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_METRICS), reason="reference tree not mounted"
)


def run_ref(code: str, cwd: str, timeout: int = 600) -> dict:
    """Run `code` with the reference metric dir as cwd (its flat imports
    resolve via sys.path[0]); the snippet must print one RESULT:{json} line."""
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=cwd, capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, f"reference snippet failed:\n{proc.stderr[-3000:]}"
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT:"):
            return json.loads(line[len("RESULT:"):])
    raise AssertionError(f"no RESULT line in:\n{proc.stdout[-3000:]}")


def assert_deep_close(got, want, path="", atol=1e-9):
    if isinstance(want, dict):
        assert isinstance(got, dict), f"{path}: {type(got)} vs dict"
        assert sorted(got.keys()) == sorted(
            str(k) for k in want.keys()
        ) or sorted(str(k) for k in got.keys()) == sorted(
            str(k) for k in want.keys()
        ), f"{path}: keys {sorted(got.keys())} vs {sorted(want.keys())}"
        for k, v in want.items():
            g = got[k] if k in got else got[str(k)]
            assert_deep_close(g, v, f"{path}.{k}", atol)
    elif isinstance(want, (list, tuple)):
        assert len(got) == len(want), f"{path}: len {len(got)} vs {len(want)}"
        for i, (g, w) in enumerate(zip(got, want)):
            assert_deep_close(g, w, f"{path}[{i}]", atol)
    elif isinstance(want, float) or isinstance(got, float):
        assert abs(float(got) - float(want)) <= atol, f"{path}: {got} vs {want}"
    else:
        assert got == want, f"{path}: {got} vs {want}"


# ---------------------------------------------------------------------------
# TVG — trace/metrics/tvg/eval_tvg.py:74-84
# ---------------------------------------------------------------------------

def _tvg_data(seed=0, n=40):
    rng = np.random.default_rng(seed)
    gt, preds = [], {}
    for i in range(n):
        s = float(rng.uniform(0, 80))
        e = s + float(rng.uniform(1, 40))
        gt.append({"id": i, "image_id": f"v{i}", "caption": f"query {i}",
                   "timestamp": [round(s, 2), round(e, 2)]})
        if i % 9 == 5:
            preds[str(i)] = {}  # missing-timestamp branch
            continue
        ps = max(0.0, s + float(rng.normal(0, 8)))
        pe = ps + max(0.5, (e - s) + float(rng.normal(0, 8)))
        preds[str(i)] = {"timestamp": [round(ps, 2), round(pe, 2)]}
    return gt, preds


def test_tvg_matches_reference_script():
    from trace_tpu.metrics.tvg import evaluate_tvg

    gt, preds = _tvg_data()
    with tempfile.TemporaryDirectory() as d:
        gt_file = os.path.join(d, "gt.json")
        pred_file = os.path.join(d, "pred.json")
        with open(gt_file, "w") as f:
            json.dump({"annotations": gt}, f)
        with open(pred_file, "w") as f:
            json.dump(preds, f)
        proc = subprocess.run(
            [sys.executable, os.path.join(REF_METRICS, "tvg", "eval_tvg.py"),
             "--pred_file", pred_file, "--gt_file", gt_file],
            capture_output=True, text=True, timeout=300,
        )
    assert proc.returncode == 0, proc.stderr[-2000:]
    m = re.search(
        r"IOU 0.3: ([\d.eE+-]+)\nIOU 0.5: ([\d.eE+-]+)\nIOU 0.7: ([\d.eE+-]+)\n mIOU: ([\d.eE+-]+)",
        proc.stdout,
    )
    assert m, proc.stdout[-2000:]
    ref = {"R@0.3": float(m.group(1)), "R@0.5": float(m.group(2)),
           "R@0.7": float(m.group(3)), "mIoU": float(m.group(4)) * 100}

    # the reference driver int-converts submission keys (eval_tvg.py:56-64);
    # that normalization is the file driver's job, not the metric's
    ours = evaluate_tvg(
        {int(q): p for q, p in preds.items()},
        {j["id"]: j["timestamp"] for j in gt},
    )
    for k, v in ref.items():
        assert abs(ours[k] - v) < 1e-9, (k, ours[k], v)


# ---------------------------------------------------------------------------
# VHD — trace/metrics/vhd/eval_vhd.py eval_submission (QVHighlights protocol)
# ---------------------------------------------------------------------------

def _vhd_data(seed=1, n=18):
    rng = np.random.default_rng(seed)
    lengths = [4.0, 20.0, 50.0]  # covers short/middle/long ranges
    sub, gt = [], []
    for q in range(n):
        duration = 150
        num_clips = duration // 2
        windows = []
        for w in range(1 + q % 2):
            ln = lengths[(q + w) % 3] + 2 * int(rng.integers(0, 3))
            s = 2 * int(rng.integers(0, (duration - ln) // 2))
            windows.append([float(s), float(s + ln)])
        rel_ids = sorted(rng.choice(num_clips, size=5, replace=False).tolist())
        gt.append({
            "qid": q, "query": f"q{q}", "vid": f"v{q}", "duration": duration,
            "relevant_windows": windows,
            "relevant_clip_ids": rel_ids,
            "saliency_scores": rng.integers(0, 5, size=(5, 3)).tolist(),
        })
        pw = []
        for w in range(4):
            ln = lengths[(q + w) % 3] + float(rng.normal(0, 4))
            s = float(rng.uniform(0, max(1.0, duration - max(ln, 1))))
            pw.append([round(s, 2), round(s + max(ln, 1.0), 2),
                       round(float(rng.uniform(0, 1)), 4)])
        sub.append({
            "qid": q, "query": f"q{q}", "vid": f"v{q}",
            "pred_relevant_windows": pw,
            "pred_saliency_scores": rng.uniform(0, 1, size=num_clips).round(4).tolist(),
        })
    return sub, gt


def test_vhd_matches_reference_eval_submission():
    from trace_tpu.metrics.vhd import eval_submission

    sub, gt = _vhd_data()
    with tempfile.TemporaryDirectory() as d:
        sub_file = os.path.join(d, "sub.json")
        gt_file = os.path.join(d, "gt.json")
        with open(sub_file, "w") as f:
            json.dump(sub, f)
        with open(gt_file, "w") as f:
            json.dump(gt, f)
        code = f"""
import json
import eval_vhd
sub = json.load(open({sub_file!r}))
gt = json.load(open({gt_file!r}))
r = eval_vhd.eval_submission(sub, gt, verbose=False)
print("RESULT:" + json.dumps(r))
"""
        ref = run_ref(code, cwd=os.path.join(REF_METRICS, "vhd"))

    ours = eval_submission(sub, gt)
    ours_json = json.loads(json.dumps(ours))
    assert_deep_close(ours_json, ref, atol=1e-9)


# ---------------------------------------------------------------------------
# DVC — trace/metrics/dvc/eval_dvc.py components
# ---------------------------------------------------------------------------

def _segments(rng, k, tmax=100.0):
    out = []
    for _ in range(k):
        s = float(rng.uniform(0, tmax * 0.8))
        out.append([round(s, 2), round(s + float(rng.uniform(0.5, tmax * 0.4)), 2)])
    return out


def test_dvc_detections_match_reference():
    from trace_tpu.metrics.dvc import evaluate_detections

    rng = np.random.default_rng(2)
    cases = []
    for k, s_splits in [(5, [2] * 6), (3, [1, 1, 2, 2, 2]), (4, [2, 2, 2])]:
        cases.append({
            "pred": _segments(rng, k),
            "gt": _segments(rng, len(s_splits)),
            "splits": s_splits,
        })
    with tempfile.TemporaryDirectory() as d:
        data_file = os.path.join(d, "cases.json")
        with open(data_file, "w") as f:
            json.dump(cases, f)
        code = f"""
import json
import numpy as np
import eval_dvc
cases = json.load(open({data_file!r}))
out = []
for c in cases:
    p, r, ious = eval_dvc.evaluate_detections(
        np.asarray(c["pred"]), np.asarray(c["gt"]), np.asarray(c["splits"]))
    out.append({{"p": list(p), "r": list(r),
                 "ious": {{str(k): v.tolist() for k, v in ious.items()}}}})
print("RESULT:" + json.dumps(out))
"""
        ref = run_ref(code, cwd=os.path.join(REF_METRICS, "dvc"))

    for c, want in zip(cases, ref):
        p, r, ious = evaluate_detections(
            np.asarray(c["pred"]), np.asarray(c["gt"]), np.asarray(c["splits"])
        )
        np.testing.assert_allclose(p, want["p"], atol=1e-12)
        np.testing.assert_allclose(r, want["r"], atol=1e-12)
        for k, m in want["ious"].items():
            np.testing.assert_allclose(ious[int(k)], np.asarray(m), atol=1e-12)


def test_soda_dp_assignment_matches_reference():
    from trace_tpu.metrics.dvc import dp_assignment

    rng = np.random.default_rng(3)
    mats = [rng.uniform(0, 1, size=(m, n)).round(4).tolist()
            for m, n in [(1, 1), (2, 5), (5, 2), (4, 4), (7, 3), (6, 8)]]
    with tempfile.TemporaryDirectory() as d:
        data_file = os.path.join(d, "mats.json")
        with open(data_file, "w") as f:
            json.dump(mats, f)
        code = f"""
import json
import numpy as np
import eval_dvc
mats = json.load(open({data_file!r}))
out = []
for m in mats:
    score, pairs = eval_dvc.chased_dp_assignment(np.asarray(m))
    out.append({{"score": float(score), "pairs": [list(map(int, p)) for p in pairs]}})
print("RESULT:" + json.dumps(out))
"""
        ref = run_ref(code, cwd=os.path.join(REF_METRICS, "dvc"))
    for m, want in zip(mats, ref):
        score, pairs = dp_assignment(np.asarray(m))
        assert abs(score - want["score"]) < 1e-9
        assert [list(p) for p in pairs] == want["pairs"]


def _captions(rng, k, vocab=("cook", "stir", "the", "pan", "add", "oil",
                             "egg", "slice", "onion", "heat", "salt", "mix")):
    return [" ".join(rng.choice(vocab, size=int(rng.integers(3, 9))).tolist())
            for _ in range(k)]


def test_cider_matches_vendored_scorer():
    from trace_tpu.metrics.captioning import Cider

    rng = np.random.default_rng(4)
    n = 12
    gts = {str(i): _captions(rng, int(rng.integers(1, 4))) for i in range(n)}
    res = {str(i): _captions(rng, 1) for i in range(n)}
    with tempfile.TemporaryDirectory() as d:
        data_file = os.path.join(d, "caps.json")
        with open(data_file, "w") as f:
            json.dump({"gts": gts, "res": res}, f)
        code = f"""
import json
from metrics.cider import Cider
data = json.load(open({data_file!r}))
score, scores = Cider().compute_score(data["gts"], data["res"])
print("RESULT:" + json.dumps({{"score": float(score), "scores": list(map(float, scores))}}))
"""
        ref = run_ref(code, cwd=os.path.join(REF_METRICS, "dvc"))

    score, scores = Cider().compute_score(gts, res)
    assert abs(score - ref["score"]) < 1e-9
    np.testing.assert_allclose(scores, ref["scores"], atol=1e-9)


def test_sodac_matches_reference_with_cider():
    """sodac end-to-end (DP over IoU x scorer matrix), CIDEr as the scorer on
    both sides so the METEOR jar is not needed.  Pred caption count kept < 10
    (at >= 10 the reference's lexicographic key sort permutes the score
    matrix columns against the IoU matrix — a reference defect we do not
    exercise)."""
    from trace_tpu.metrics.captioning import Cider
    from trace_tpu.metrics.dvc import evaluate_detections, sodac

    rng = np.random.default_rng(5)
    n_pred, n_gt = 6, 5
    pred_segs = _segments(rng, n_pred)
    gt_segs = _segments(rng, n_gt)
    splits = [2] * n_gt
    pred_caps = _captions(rng, n_pred)
    gt_caps = _captions(rng, n_gt)

    with tempfile.TemporaryDirectory() as d:
        data_file = os.path.join(d, "soda.json")
        with open(data_file, "w") as f:
            json.dump({"ps": pred_segs, "gs": gt_segs, "splits": splits,
                       "pc": pred_caps, "gc": gt_caps}, f)
        code = f"""
import json
import numpy as np
import eval_dvc
from metrics.cider import Cider
data = json.load(open({data_file!r}))
_, _, ious = eval_dvc.evaluate_detections(
    np.asarray(data["ps"]), np.asarray(data["gs"]), np.asarray(data["splits"]))
fs = eval_dvc.sodac(ious, Cider(), data["pc"], data["gc"], np.asarray(data["splits"]))
print("RESULT:" + json.dumps({{str(k): float(v) for k, v in fs.items()}}))
"""
        ref = run_ref(code, cwd=os.path.join(REF_METRICS, "dvc"))

    _, _, ious = evaluate_detections(
        np.asarray(pred_segs), np.asarray(gt_segs), np.asarray(splits)
    )
    fs = sodac(ious, Cider(), pred_caps, gt_caps, np.asarray(splits))
    for k, v in ref.items():
        assert abs(fs[int(k)] - v) < 1e-9, (k, fs[int(k)], v)


def test_bleu_matches_nltk_corpus_bleu():
    """Corpus BLEU-1..4 vs nltk's corpus_bleu (same published algorithm the
    reference scores ANet-DVC with via pycocoevalcap, which is absent in
    this environment; nltk is the available independent implementation).
    Hypotheses share long spans with references so every n-gram order has
    nonzero matches (our 1e-9 smoothing is then negligible)."""
    nltk = pytest.importorskip("nltk")
    from nltk.translate.bleu_score import corpus_bleu

    from trace_tpu.metrics.bleu_rouge import Bleu

    rng = np.random.default_rng(6)
    base = ("add the chopped onion to the hot pan and stir until golden "
            "then season with salt and pepper to taste").split()
    gts, res = {}, {}
    refs_all, hyps_all = [], []
    for i in range(10):
        n_refs = int(rng.integers(1, 4))
        refs = []
        for _ in range(n_refs):
            r = list(base)
            # perturb: drop/duplicate a couple of words
            for _ in range(int(rng.integers(0, 3))):
                j = int(rng.integers(0, len(r)))
                r.insert(j, r[int(rng.integers(0, len(r)))])
            refs.append(r)
        h = list(base)
        for _ in range(int(rng.integers(0, 4))):
            j = int(rng.integers(0, len(h) - 1))
            del h[j]
        gts[str(i)] = [" ".join(r) for r in refs]
        res[str(i)] = [" ".join(h)]
        refs_all.append(refs)
        hyps_all.append(h)

    ours, _ = Bleu(4).compute_score(gts, res)
    for k in range(1, 5):
        weights = tuple([1.0 / k] * k)
        want = corpus_bleu(refs_all, hyps_all, weights=weights)
        assert abs(ours[k - 1] - want) < 1e-6, (k, ours[k - 1], want)


class _StubWordnet:
    """Empty wordnet => nltk's METEOR runs exact+stem only, the same module
    set our aligner implements (no wordnet corpus in this environment)."""

    def synsets(self, word):
        return []


def _meteor_corpus(seed=7, n=24):
    rng = np.random.default_rng(seed)
    vocab = ("cook stir the pan add oil onion chop season salt pepper heat "
             "serve plate garnish slowly slicing sliced cooks stirred "
             "adding chopped heated serving garnished quickly then and a "
             "with until golden brown").split()
    pairs = []
    for _ in range(n):
        ref = [vocab[int(rng.integers(0, len(vocab)))]
               for _ in range(int(rng.integers(4, 16)))]
        # hypothesis = perturbed reference: deletions, inserts, inflection
        # swaps (cook<->cooks etc. exercise the stem stage), plus repeated
        # words so the reverse-scan matching order is observable
        hyp = list(ref)
        for _ in range(int(rng.integers(0, 4))):
            if len(hyp) > 2:
                del hyp[int(rng.integers(0, len(hyp)))]
        for _ in range(int(rng.integers(0, 4))):
            hyp.insert(int(rng.integers(0, len(hyp) + 1)),
                       vocab[int(rng.integers(0, len(vocab)))])
        pairs.append((hyp, ref))
    return pairs


def test_meteor_align_matches_nltk():
    """Our METEOR aligner + scorer (metrics/meteor_align.py) vs nltk's
    published implementation, both restricted to the exact+stem module set
    (stub wordnet), original-METEOR parameters — agreement to 1e-9.  This
    pins the alignment discipline (reverse scan to the latest unused
    reference slot), the chunk count, and the fragmentation penalty."""
    nltk = pytest.importorskip("nltk")
    from nltk.stem.porter import PorterStemmer
    from nltk.translate.meteor_score import single_meteor_score

    from trace_tpu.metrics.meteor_align import (
        NLTK_PARAMS,
        segment_stats,
        score_from_stats,
    )

    st = PorterStemmer()
    wn = _StubWordnet()
    checked_nonzero = 0
    for hyp, ref in _meteor_corpus():
        want = single_meteor_score(ref, hyp, stemmer=st, wordnet=wn)
        got = score_from_stats(
            segment_stats(hyp, ref, NLTK_PARAMS, stemmer=st), NLTK_PARAMS
        )
        assert abs(got - want) < 1e-9, (hyp, ref, got, want)
        checked_nonzero += want > 0
    assert checked_nonzero >= 10  # the corpus actually exercises the metric


def test_meteor_fallback_scorer_semantics():
    """MeteorFallback (METEOR-1.5 'en' parameters, jar-style corpus
    aggregation): perfect hypotheses score ~1, corpus score of a single
    segment equals that segment's score, and word-salad scores below a
    fluent partial match (fragmentation penalty active)."""
    from trace_tpu.metrics.captioning import MeteorFallback

    m = MeteorFallback()
    # single segment: corpus aggregate == segment score
    gts = {"0": ["add the chopped onion to the pan"]}
    res = {"0": ["add the chopped onion to the pan"]}
    final, scores = m.compute_score(gts, res)
    assert abs(final - scores[0]) < 1e-12
    assert scores[0] > 0.95  # one chunk, full match: penalty ~ gamma/m^beta

    # fluent prefix vs same words shuffled: fragmentation must separate them
    gts = {"0": ["add the chopped onion to the hot pan and stir"]}
    fluent = {"0": ["add the chopped onion to the pan"]}
    salad = {"0": ["pan add onion the to chopped the"]}
    f_fluent, _ = m.compute_score(gts, fluent)
    f_salad, _ = m.compute_score(gts, salad)
    assert f_fluent > f_salad > 0

    # stem stage: inflection variants still match (lower than exact, via
    # the 0.6 stage weight, but far above no-match)
    gts = {"0": ["the cook stirred the pan slowly"]}
    res = {"0": ["the cooks stirring the pan slow"]}
    final, _ = m.compute_score(gts, res)
    assert final > 0.3


def test_rouge_l_matches_google_rouge_score():
    """Our ROUGE-L (LCS F, beta=1.2, max over refs) vs Google's rouge_score
    package: identical LCS precision/recall per pair (their fmeasure is
    beta=1, so recombine their P/R with beta=1.2 and take the same
    max-over-refs)."""
    rs = pytest.importorskip("rouge_score")
    from rouge_score import rouge_scorer

    from trace_tpu.metrics.bleu_rouge import RougeL

    class SplitTok:
        def tokenize(self, text):
            return text.split()

    scorer = rouge_scorer.RougeScorer(["rougeL"], tokenizer=SplitTok())
    rng = np.random.default_rng(11)
    vocab = ("pan stir add cook onion oil heat salt plate serve the a with "
             "then slowly until golden quickly brown").split()
    gts, res = {}, {}
    for i in range(20):
        n_refs = int(rng.integers(1, 4))
        mk = lambda lo, hi: " ".join(
            vocab[int(rng.integers(0, len(vocab)))]
            for _ in range(int(rng.integers(lo, hi)))
        )
        gts[str(i)] = [mk(4, 14) for _ in range(n_refs)]
        res[str(i)] = [mk(3, 12)]

    ours_avg, ours_per = RougeL().compute_score(gts, res)
    beta = RougeL.beta
    for j, k in enumerate(sorted(gts.keys())):
        want = 0.0
        for ref in gts[k]:
            s = scorer.score(ref, res[k][0])["rougeL"]
            p, r = s.precision, s.recall
            f = ((1 + beta ** 2) * p * r) / (r + beta ** 2 * p) if p and r else 0.0
            want = max(want, f)
        assert abs(ours_per[j] - want) < 1e-9, (k, ours_per[j], want)
    assert abs(ours_avg - float(np.mean(ours_per))) < 1e-12
