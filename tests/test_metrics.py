"""Metric correctness: known-value and perfect-prediction tests."""

import numpy as np

from trace_tpu.metrics.captioning import Cider, MeteorFallback, PTBTokenizer
from trace_tpu.metrics.dvc import (
    dp_assignment,
    evaluate_dense_captions,
    evaluate_detections,
    segment_iou,
)
from trace_tpu.metrics.temporal import (
    detection_ap,
    temporal_iou_cross,
    voc_interpolated_ap,
    window_iou,
)
from trace_tpu.metrics.tvg import evaluate_tvg
from trace_tpu.metrics.vhd import compute_mr_r1, eval_submission, mk_gt_scores


class TestTemporal:
    def test_window_iou_values(self):
        assert window_iou([0, 10], [0, 10]) == 1.0
        assert window_iou([0, 10], [5, 15]) == 5 / 15
        assert window_iou([0, 5], [10, 20]) == 0.0

    def test_cross_iou(self):
        a = np.array([[0.0, 10.0]])
        b = np.array([[0.0, 10.0], [5.0, 15.0], [20.0, 30.0]])
        iou = temporal_iou_cross(a, b)[0]
        np.testing.assert_allclose(iou, [1.0, 5 / 15, 0.0])

    def test_voc_ap_perfect(self):
        assert voc_interpolated_ap(np.array([1.0, 1.0]), np.array([0.5, 1.0])) == 1.0

    def test_detection_ap_perfect(self):
        gt = [{"video-id": 1, "t-start": 0, "t-end": 10}]
        pred = [{"video-id": 1, "t-start": 0, "t-end": 10, "score": 1.0}]
        ap = detection_ap(gt, pred, np.array([0.5]))
        assert ap[0] == 1.0

    def test_detection_ap_miss(self):
        gt = [{"video-id": 1, "t-start": 0, "t-end": 10}]
        pred = [{"video-id": 1, "t-start": 50, "t-end": 60, "score": 1.0}]
        assert detection_ap(gt, pred, np.array([0.5]))[0] == 0.0


class TestTVG:
    def test_perfect(self):
        preds = {1: {"timestamp": [0, 10]}, 2: {"timestamp": [5, 9]}}
        gt = {1: [0, 10], 2: [5, 9]}
        out = evaluate_tvg(preds, gt)
        assert out["R@0.5"] == 100.0
        assert abs(out["mIoU"] - 100.0) < 1e-9

    def test_missing_pred_scores_zero(self):
        preds = {1: {"timestamp": [0, 10]}, 2: {}}
        gt = {1: [0, 10], 2: [5, 9]}
        out = evaluate_tvg(preds, gt)
        assert out["num_queries"] == 1
        assert out["R@0.5"] == 100.0  # denominator = real predictions only


class TestVHD:
    def _gt(self, qid=1):
        return {
            "qid": qid,
            "duration": 10,
            "relevant_windows": [[2.0, 6.0]],
            "relevant_clip_ids": [1, 2],
            "saliency_scores": [[4, 4, 4], [3, 3, 3]],
        }

    def test_perfect_mr(self):
        sub = [{
            "qid": 1,
            "pred_relevant_windows": [[2.0, 6.0, 0.9]],
            "pred_saliency_scores": [0.0, 1.0, 0.5, 0.0, 0.0],
        }]
        out = eval_submission(sub, [self._gt()])
        assert out["brief"]["MR-full-mAP"] == 100.0
        assert out["brief"]["MR-full-R1@0.7"] == 100.0
        assert out["HL-min-VeryGood"]["HL-Hit1"] == 100.0

    def test_mk_gt_scores_shape(self):
        full = mk_gt_scores(self._gt())
        assert full.shape == (5, 3)
        assert (full[1] == 4).all() and (full[0] == 0).all()


class TestCider:
    def test_identical_captions_score_high(self):
        gts = {"a": ["a cat sits on the mat"], "b": ["dogs run fast"]}
        res = {"a": ["a cat sits on the mat"], "b": ["dogs run fast"]}
        mean, per = Cider().compute_score(gts, res)
        assert mean > 5.0  # identical captions saturate near 10
        assert len(per) == 2

    def test_disjoint_captions_score_zero(self):
        gts = {"a": ["a cat sits on the mat"]}
        res = {"a": ["zebra xylophone quartz"]}
        mean, _ = Cider().compute_score(gts, res)
        assert mean == 0.0


class TestPTB:
    def test_punctuation_dropped_lowercase(self):
        t = PTBTokenizer.tokenize_sentence("Hello, World! It's GOOD.")
        assert t == "hello world it's good"


class TestMeteorFallback:
    def test_exact_match_beats_mismatch(self):
        m = MeteorFallback()
        good, _ = m.compute_score({"a": ["the cat"]}, {"a": ["the cat"]})
        bad, _ = m.compute_score({"a": ["the cat"]}, {"a": ["zebra"]})
        assert good > bad == 0.0


class TestDVC:
    def test_dp_assignment_diagonal(self):
        s = np.array([[0.9, 0.1], [0.1, 0.8]])
        score, pairs = dp_assignment(s)
        assert abs(score - 1.7) < 1e-9
        assert pairs == [(0, 0), (1, 1)]

    def test_detections_perfect(self):
        pred = np.array([[0.0, 10.0], [20.0, 30.0]])
        gt = np.array([[0.0, 10.0], [20.0, 30.0]])
        splits = np.array([1, 1])
        p, r, ious = evaluate_detections(pred, gt, splits)
        assert all(x == 1.0 for x in p)
        assert all(x == 1.0 for x in r)
        assert ious[1].shape == (2, 2)

    def test_dense_captions_perfect(self):
        # two events: a 1-caption corpus makes CIDEr degenerately 0
        # (idf = log(corpus_size) = 0), faithful to the reference scorer.
        out = evaluate_dense_captions(
            pred_segments=[np.array([[0.0, 10.0], [20.0, 30.0]])],
            gt_segments=[np.array([[0.0, 10.0], [20.0, 30.0]])],
            pred_captions=[["a cat plays piano", "dogs run in the park"]],
            gt_captions=[["a cat plays piano", "dogs run in the park"]],
            splits=[np.array([1, 1])],
            keys=["vid1"],
        )
        assert out["F1_Score"][0] == 1.0
        assert out["CIDER"][0] > 2.0
        assert out["SODA_c_1"][0] > 0.5

    def test_segment_iou_unordered_inputs(self):
        assert segment_iou([10, 0], [0, 10]) > 0.99
