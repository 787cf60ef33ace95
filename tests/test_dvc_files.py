"""DVC file-driver chain: fmt results -> reformat -> eval_with_files."""

import json

import numpy as np

from trace_tpu.eval.evaluate import score_results


def test_score_results_dvc(tmp_path):
    results = [
        {
            "video": "vid1.mp4",
            "id": 0,
            "timestamps": [[0.0, 10.0], [20.0, 30.0]],
            "scores": [[4.0], [3.0]],
            "captions": ["mix the flour and water", "bake the bread in the oven"],
        },
        {
            "video": "vid2.mp4",
            "id": 1,
            "timestamps": [[5.0, 15.0]],
            "scores": [[2.0]],
            "captions": ["chop the onions finely"],
        },
    ]
    gt = {
        "annotations": [
            {
                "image_id": "vid1.mp4",
                "segments": [[0.0, 10.0], [20.0, 30.0]],
                "pure_cap": "mix the flour and water. bake the bread in the oven",
            },
            {
                "image_id": "vid2.mp4",
                "segments": [[5.0, 15.0]],
                "pure_cap": "chop the onions finely",
            },
        ]
    }
    gt_file = tmp_path / "val.caption_coco_format.json"
    with open(gt_file, "w") as f:
        json.dump(gt, f)

    metrics = score_results("dvc", results, str(gt_file))
    assert metrics["F1_Score"] == 100.0
    assert metrics["Precision_Mean"] == 100.0
    assert metrics["CIDER"] > 0.0
    assert "SODA_c_2" in metrics  # val split -> split id 2
    assert metrics["Para_METEOR"] > 0.5  # identical paragraphs


def test_score_results_vhd(tmp_path):
    results = [
        {
            "video": "v.mp4",
            "id": 7,
            "timestamps": [[4.0]],
            "scores": [[5.0]],
            "captions": ["person dances"],
        }
    ]
    gt = {
        "annotations": [
            {
                "image_id": "v.mp4",
                "id": 7,
                "duration": 10,
                "segments": [[2.0, 6.0]],
                "relevant_clip_ids": [1, 2],
                "saliency_scores": [[4, 4, 4], [3, 3, 3]],
                "caption": "person dances",
            }
        ]
    }
    gt_file = tmp_path / "test.caption_coco_format.json"
    with open(gt_file, "w") as f:
        json.dump(gt, f)

    metrics = score_results("vhd", results, str(gt_file))
    assert "brief" in metrics
    assert "HL-min-VeryGood" in metrics
