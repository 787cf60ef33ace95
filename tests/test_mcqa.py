"""MCQA helpers: QA templates, option extraction, bounded frame sampling."""

import numpy as np

from trace_tpu.eval.mcqa import (
    check_ans,
    extract_option,
    mvbench_qa,
    segment_midpoint_indices,
    videomme_qa,
)


class TestQATemplates:
    def test_mvbench(self):
        q, a = mvbench_qa({
            "question": "What happens?",
            "candidates": ["runs", "sits", "jumps"],
            "answer": "sits",
        })
        assert "Question: What happens?" in q
        assert "(A) runs" in q and "(B) sits" in q and "(C) jumps" in q
        assert a == "(B) sits"

    def test_videomme(self):
        q, a = videomme_qa({
            "question": "Color of the car?",
            "options": ["A. red", "B. blue"],
            "answer": "B",
        })
        assert "(A) red" in q and "(B) blue" in q
        assert a == "(B) blue"


class TestAnswerMatching:
    def test_extract_variants(self):
        assert extract_option("(B) sits") == "b"
        assert extract_option("The answer is (c).") == "c"
        assert extract_option("A. something") == "a"
        assert extract_option("no letters here") == "a"  # fallback

    def test_check_ans(self):
        assert check_ans("(B) sits down", "(B) sits")
        assert not check_ans("(A) runs", "(B) sits")
        assert check_ans("I think the answer is (b).", "(b) sits")


class TestBoundedSampling:
    def test_full_range(self):
        idx, ts = segment_midpoint_indices(4, fps=10.0, max_frame=99)
        assert len(idx) == 4
        assert all(0 <= i <= 99 for i in idx)
        assert ts[0][0] == idx[0] / 10.0

    def test_bound_restricts(self):
        idx, _ = segment_midpoint_indices(4, fps=10.0, max_frame=999, bound=(2.0, 4.0))
        assert all(20 <= i <= 40 for i in idx)

    def test_midpoints_monotone(self):
        idx, _ = segment_midpoint_indices(8, fps=30.0, max_frame=239)
        assert (np.diff(idx) > 0).all()
