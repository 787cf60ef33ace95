"""Full eval drivers over REAL-format fixtures (VERDICT r3 item 6).

Hand-written annotation records in the exact reference schemas — MVBench
subtask JSONs with [start,end] bounds + a frame-dir task
(reference mvbench/evaluate.py:169-182,304-333 and the data_list at
:547-576), Video-MME flat records with url/options/answer + .vtt subtitles
(videomme/evaluate.py:111-134,287-302), and {split}.caption_coco_format.json
for dvc/tvg/vhd (eval/evaluate.py:58-76, metrics/dvc eval_with_files) —
driven through real media readers (mp4 via cv2/native decoder, gif, jpeg
frame dirs), not ByteTokenizer-only synthetic arrays.
"""

import json
import os

import jax
import numpy as np
import pytest

from trace_tpu.model.config import TraceConfig
from trace_tpu.model.trace_model import init_trace_params
from trace_tpu.runtime.pipeline import TracePipeline
from trace_tpu.tokenizers.text import ByteTokenizer


@pytest.fixture(scope="module")
def pipe():
    cfg = TraceConfig.tiny()
    params = init_trace_params(cfg, jax.random.PRNGKey(0))
    return TracePipeline(params=params, config=cfg, tokenizer=ByteTokenizer())


def _write_mp4(path, n_frames=30, fps=10.0, w=64, h=48, seed=0):
    import cv2

    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    vw = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    assert vw.isOpened()
    rng = np.random.default_rng(seed)
    for _ in range(n_frames):
        vw.write(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    vw.release()


def _write_gif(path, n_frames=12, seed=0):
    import imageio

    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    rng = np.random.default_rng(seed)
    imageio.mimsave(
        str(path),
        [rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
         for _ in range(n_frames)],
    )


def _write_frame_dir(path, n_frames=24, seed=0):
    from PIL import Image

    os.makedirs(str(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(1, n_frames + 1):  # 1-indexed %05d.jpg, fps=3 dumps
        Image.fromarray(
            rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        ).save(os.path.join(str(path), f"{i:05d}.jpg"))


VTT = """WEBVTT

00:00.000 --> 00:02.000
<c>Hello there</c>

00:02.000 --> 00:04.000
General Kenobi
"""


# ---------------------------------------------------------------------------
# MVBench
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mvbench_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("mvbench")
    anno, data = root / "json", root / "video"

    # Action Sequence: STAR/Charades mp4s WITH start/end bounds
    _write_mp4(data / "star/Charades_v1_480/ABC12.mp4", seed=1)
    _write_mp4(data / "star/Charades_v1_480/DEF34.mp4", seed=2)
    action_sequence = [
        {
            "video": "ABC12.mp4",
            "question": "What happened after the person took the box?",
            "candidates": [
                "Closed the door.", "Sat on the sofa.",
                "Opened the window.", "Threw the pillow.",
            ],
            "answer": "Sat on the sofa.",
            "start": 0.4, "end": 2.4,
        },
        {
            "video": "DEF34.mp4",
            "question": "What happened before the person held the food?",
            "candidates": ["Washed the dishes.", "Tidied up the table."],
            "answer": "Washed the dishes.",
            "start": 1.0, "end": 2.9,
        },
    ]

    # Object Existence: clevrer, no bounds; one gif exercises the gif reader
    _write_mp4(data / "clevrer/video_validation/video_10000.mp4", seed=3)
    _write_gif(data / "clevrer/video_validation/video_10001.gif", seed=4)
    object_existence = [
        {
            "video": "video_10000.mp4",
            "question": "Is there a red cube?",
            "candidates": ["yes", "no"],
            "answer": "no",
        },
        {
            "video": "video_10001.gif",
            "question": "Is there a metal sphere?",
            "candidates": ["yes", "no"],
            "answer": "yes",
        },
    ]

    # Episodic Reasoning: tvqa 3-fps jpeg frame dirs, bounded, 1-indexed
    _write_frame_dir(data / "tvqa/frames_fps3_hq/s01e02_clip_07", seed=5)
    episodic_reasoning = [
        {
            "video": "s01e02_clip_07",
            "question": "Where was Sheldon when he spoke?",
            "candidates": [
                "In the kitchen.", "At the office.",
                "On the stairs.", "In the car.", "At the cafe.",
            ],
            "answer": "In the kitchen.",
            "start": 1.0, "end": 7.0,
        },
    ]

    os.makedirs(anno)
    for name, recs in [
        ("action_sequence.json", action_sequence),
        ("object_existence.json", object_existence),
        ("episodic_reasoning.json", episodic_reasoning),
    ]:
        with open(anno / name, "w") as f:
            json.dump(recs, f)
    return str(anno), str(data)


class TestMVBenchRealFormat:
    def test_full_driver(self, pipe, mvbench_tree, tmp_path):
        from trace_tpu.eval.mcqa import run_mvbench

        anno, data = mvbench_tree
        out = tmp_path / "out"
        final = run_mvbench(
            pipe, anno, data,
            num_frames=pipe.config.num_frames, batch_size=2,
            max_new_tokens=12, output_dir=str(out),
        )
        # every fixture record decoded and scored — no reader failures
        assert final["num_failures"] == 0
        for task in ("Action Sequence", "Object Existence",
                     "Episodic Reasoning"):
            assert 0.0 <= final[task] <= 100.0
        assert 0.0 <= final["Avg"] <= 100.0
        # reference-shaped artifacts (mvbench/evaluate.py:617-640)
        with open(out / "test.json") as f:
            dump = json.load(f)
        assert set(dump) == {"acc_dict", "res_list", "failures"}
        assert len(dump["res_list"]) == 5
        assert {r["group"] for r in dump["res_list"]} == {
            "Action Sequence", "Object Existence", "Episodic Reasoning"
        }
        with open(out / "upload_leaderboard.json") as f:
            board = json.load(f)
        assert "Avg" in board


# ---------------------------------------------------------------------------
# Video-MME (with subtitles)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def videomme_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("videomme")
    data = root / "media"
    _write_mp4(data / "data/fFjv93ACGo8.mp4", seed=7)
    _write_mp4(data / "data/zz9xJrPPpW0.mp4", seed=8)
    os.makedirs(data / "subtitle")
    with open(data / "subtitle/fFjv93ACGo8.vtt", "w") as f:
        f.write(VTT)  # zz9x... has NO subtitle file -> degrade path

    records = [
        {
            "video_id": "001",
            "duration": "short",
            "domain": "Knowledge",
            "sub_category": "Humanity & History",
            "url": "https://www.youtube.com/watch?v=fFjv93ACGo8",
            "videoID": "fFjv93ACGo8",
            "question_id": "001-1",
            "task_type": "Counting Problem",
            "question": "How many people appear?",
            "options": ["A. one", "B. two", "C. three", "D. four"],
            "answer": "B",
        },
        {
            "video_id": "002",
            "duration": "medium",
            "domain": "Film & Television",
            "sub_category": "Movies",
            "url": "https://www.youtube.com/watch?v=zz9xJrPPpW0",
            "videoID": "zz9xJrPPpW0",
            "question_id": "002-1",
            "task_type": "Action Recognition",
            "question": "What does the chef do first?",
            "options": ["A. chop", "B. stir", "C. pour", "D. taste"],
            "answer": "A",
        },
    ]
    anno = root / "videomme.json"
    with open(anno, "w") as f:
        json.dump(records, f)
    return str(anno), str(data)


class _SpyPipeline:
    """Pass-through wrapper recording the questions handed to inference."""

    def __init__(self, pipe):
        self._pipe = pipe
        self.questions = []

    def __getattr__(self, k):
        return getattr(self._pipe, k)

    def infer_events_batch(self, frames, ts, questions, **kw):
        self.questions.extend(questions)
        return self._pipe.infer_events_batch(frames, ts, questions, **kw)


class TestVideoMMERealFormat:
    def test_with_subtitles(self, pipe, videomme_tree, tmp_path):
        from trace_tpu.eval.mcqa import run_videomme

        anno, data = videomme_tree
        spy = _SpyPipeline(pipe)
        final = run_videomme(
            spy, anno, data,
            num_frames=pipe.config.num_frames, batch_size=2,
            max_new_tokens=12, output_dir=str(tmp_path / "out"),
            use_subtitles=True, tokenizer=pipe.tokenizer,
        )
        assert final["num_failures"] == 0
        assert 0.0 <= final["short"] <= 100.0
        assert 0.0 <= final["medium"] <= 100.0
        subbed = [q for q in spy.questions
                  if "subtitles are listed below" in q]
        assert len(subbed) == 1  # only the video WITH a .vtt
        # subtitle text precedes the video token (reference order,
        # videomme/evaluate.py:322-323); cue tags stripped, cues joined
        q = subbed[0]
        assert "Hello there" in q and "General Kenobi" in q
        assert q.index("Hello there") < q.index("<video>")
        assert "<c>" not in q

    def test_without_subtitles(self, pipe, videomme_tree, tmp_path):
        from trace_tpu.eval.mcqa import run_videomme

        anno, data = videomme_tree
        spy = _SpyPipeline(pipe)
        final = run_videomme(
            spy, anno, data,
            num_frames=pipe.config.num_frames, batch_size=2,
            max_new_tokens=12,
        )
        assert final["num_failures"] == 0
        assert all("subtitles" not in q for q in spy.questions)


# ---------------------------------------------------------------------------
# VTG tasks: {split}.caption_coco_format.json over real mp4/gif media
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def vtg_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("vtg")
    vids = root / "videos"
    _write_mp4(vids / "xHr8X2Wpmno.mp4", seed=11)
    _write_mp4(vids / "AO8rmji3GCI.mp4", seed=12)
    _write_gif(vids / "yCorkDc1wAB.gif", seed=13)

    # dvc: youcook2-style pure_cap + anet-style caption-only records
    dvc = [
        {
            "image_id": "xHr8X2Wpmno.mp4", "id": 0,
            "caption": "Person opens a box. Person closes the box.",
            "pure_cap": "Person opens a box. Person closes the box",
            "segments": [[0.5, 1.5], [2.0, 2.9]],
            "duration": 3.0,
        },
        {
            "image_id": "AO8rmji3GCI.mp4", "id": 1,
            "caption": "A chef seasons the meat carefully. "
                       "The chef plates the finished dish.",
            "segments": [[0.2, 1.4], [1.6, 2.8]],
            "duration": 3.0,
        },
        {
            "image_id": "yCorkDc1wAB.gif", "id": 2,
            "caption": "Someone waves at the camera repeatedly here.",
            "pure_cap": "Someone waves at the camera repeatedly here",
            "segments": [[0.1, 1.0]],
            "duration": 1.2,
        },
    ]
    # tvg: charades-sta-style single query/timestamp per record
    tvg = [
        {"image_id": "xHr8X2Wpmno.mp4", "id": 0,
         "caption": "person opens a box", "timestamp": [0.5, 1.5],
         "duration": 3.0},
        {"image_id": "AO8rmji3GCI.mp4", "id": 1,
         "caption": "a chef seasons the meat", "timestamp": [0.2, 1.4],
         "duration": 3.0},
    ]
    # vhd: qvhighlights-style with clip saliency
    # duration/2s-clip grid: relevant_clip_ids must index inside
    # duration//2 clips (metrics/vhd.mk_gt_scores, eval_vhd.py:228-236)
    vhd = [
        {"image_id": "xHr8X2Wpmno.mp4", "id": 0,
         "caption": "person interacts with a box",
         "segments": [[0, 4]], "duration": 10.0,
         "relevant_clip_ids": [0, 1], "saliency_scores": [[2, 3, 2], [1, 2, 2]]},
        {"image_id": "AO8rmji3GCI.mp4", "id": 1,
         "caption": "chef cooks meat",
         "segments": [[2, 6]], "duration": 10.0,
         "relevant_clip_ids": [1, 2], "saliency_scores": [[4, 4, 3], [2, 2, 1]]},
    ]

    files = {}
    for task, recs in [("dvc", dvc), ("tvg", tvg), ("vhd", vhd)]:
        d = root / task
        os.makedirs(d)
        p = d / "val.caption_coco_format.json"
        with open(p, "w") as f:
            json.dump({"annotations": recs}, f)
        files[task] = str(p)
    return files, str(vids)


class TestVTGRealFormat:
    @pytest.mark.parametrize("task", ["dvc", "tvg", "vhd"])
    def test_run_and_score(self, pipe, vtg_tree, task):
        from trace_tpu.eval.evaluate import (
            load_annotations, run_vtg_eval, score_results,
        )

        files, vids = vtg_tree
        anno = load_annotations(os.path.dirname(files[task]), "val")
        results = run_vtg_eval(
            pipe, task, anno, vids,
            num_frames=pipe.config.num_frames, batch_size=2,
            max_new_tokens=16, progress=False,
        )
        assert len(results) == len(anno)  # mp4 AND gif records all decoded
        for r in results:
            assert set(r) == {"video", "id", "timestamps", "scores",
                              "captions"}
        metrics = score_results(task, results, files[task])
        assert metrics, f"no metrics for {task}"
        for k, v in metrics.items():
            if isinstance(v, (int, float)):
                assert np.isfinite(v), (k, v)
