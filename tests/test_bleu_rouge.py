"""BLEU / ROUGE-L / ANet-DVC evaluator sanity tests."""

import numpy as np

from trace_tpu.metrics.bleu_rouge import Bleu, RougeL
from trace_tpu.metrics.dvc_anet import evaluate_anet_dvc


class TestBleu:
    def test_perfect_match(self):
        gts = {"a": ["the cat sat on the mat"], "b": ["dogs run very fast today"]}
        res = {"a": ["the cat sat on the mat"], "b": ["dogs run very fast today"]}
        scores, _ = Bleu(4).compute_score(gts, res)
        for s in scores:
            assert s > 0.99

    def test_disjoint_near_zero(self):
        gts = {"a": ["the cat sat on the mat"]}
        res = {"a": ["zebra quartz xylophone jumps wild"]}
        scores, _ = Bleu(4).compute_score(gts, res)
        assert scores[0] < 0.01

    def test_ordering(self):
        gts = {"a": ["the cat sat on the mat"]}
        good = {"a": ["the cat sat on a mat"]}
        bad = {"a": ["a mat on sat cat the"]}
        g, _ = Bleu(4).compute_score(gts, good)
        b, _ = Bleu(4).compute_score(gts, bad)
        assert g[3] > b[3]


class TestRougeL:
    def test_perfect(self):
        s, per = RougeL().compute_score({"a": ["x y z"]}, {"a": ["x y z"]})
        assert s == 1.0

    def test_subsequence(self):
        s, _ = RougeL().compute_score({"a": ["a b c d"]}, {"a": ["a c"]})
        # lcs=2, prec=1.0, rec=0.5 -> F(beta=1.2) ~ 0.577
        assert 0.5 < s < 0.7


class TestAnetDVC:
    def test_perfect_predictions(self):
        gt = {
            "v1": {
                "timestamps": [[0.0, 10.0], [20.0, 30.0]],
                "sentences": ["a cat plays piano", "dogs run in the park"],
            }
        }
        pred = {
            "v1": [
                {"timestamp": [0.0, 10.0], "caption": "a cat plays piano"},
                {"timestamp": [20.0, 30.0], "caption": "dogs run in the park"},
            ]
        }
        out = evaluate_anet_dvc(pred, gt)
        assert out["Precision"] == 1.0
        assert out["Recall"] == 1.0
        assert out["F1"] == 1.0
        assert out["Bleu_1"] > 0.99
        assert out["ROUGE_L"] > 0.99

    def test_no_overlap(self):
        gt = {"v1": {"timestamps": [[0.0, 10.0]], "sentences": ["a cat"]}}
        pred = {"v1": [{"timestamp": [50.0, 60.0], "caption": "a cat"}]}
        out = evaluate_anet_dvc(pred, gt)
        assert out["Recall"] == 0.0
        assert out["CIDEr"] == 0.0
