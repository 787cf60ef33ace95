"""Task prompt strings: format behavior (the strings themselves are data
constants; their provenance is the reference's prompt assets — exactness
matters because eval results are prompt-sensitive)."""

from trace_tpu.task_prompts import TASK_PROMPTS, get_task_prompt


def test_query_tasks_are_format_strings():
    assert "{}" in TASK_PROMPTS["mr"]
    assert "{}" in TASK_PROMPTS["vhd"]
    q = get_task_prompt("tvg").format("the cat jumps")
    assert "the cat jumps" in q


def test_task_routing():
    assert get_task_prompt("dvc").startswith("Examine the video")
    assert get_task_prompt("dvc-anet").startswith("Pinpoint")
    assert get_task_prompt("dvc-anet-ft").startswith("Localize a series")
    assert get_task_prompt("vhd").startswith("Please find the highlight")
