"""Eval harness tests: metrics, elo, omnidocbench sweep plumbing."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from dots_ocr_tpu.eval.elo import (
    EloRater,
    construct_prompt,
    parse_judge_response,
    run_elo_tournament,
)
from dots_ocr_tpu.eval.metrics import (
    levenshtein,
    normalize_markdown,
    normalized_edit_distance,
    score_pages,
)


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------


def test_levenshtein_basics():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("abc", "") == 3
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("flaw", "lawn") == 2


def test_levenshtein_unicode():
    assert levenshtein("你好世界", "你好地球") == 2


def test_normalized_edit_distance():
    assert normalized_edit_distance("", "") == 0.0
    assert normalized_edit_distance("abc", "abc") == 0.0
    assert normalized_edit_distance("abc", "xyz") == 1.0
    assert 0 < normalized_edit_distance("hello world", "hello word") < 0.2


def test_normalize_markdown_strips_inline_images():
    md = "before ![](data:image/png;base64,AAAA) after\n\nnext"
    assert normalize_markdown(md) == "before after next"


def test_score_pages():
    preds = {"p1": "hello world", "p2": "foo bar", "p3": "extra"}
    refs = {"p1": "hello world", "p2": "foo baz"}
    out = score_pages(preds, refs)
    assert out["count"] == 2
    assert out["pages"]["p1"] == 0.0
    assert 0 < out["pages"]["p2"] < 0.5
    assert out["overall"] == pytest.approx(
        (out["pages"]["p1"] + out["pages"]["p2"]) / 2
    )


# ---------------------------------------------------------------------------
# Elo
# ---------------------------------------------------------------------------


def test_construct_prompt_contains_outputs():
    p = construct_prompt("MARKDOWN_ONE", "MARKDOWN_TWO")
    assert "MARKDOWN_ONE" in p and "MARKDOWN_TWO" in p
    assert '"winner"' in p


def test_parse_judge_response():
    assert parse_judge_response('{"winner": "1", "reason": "x"}') == "1"
    assert parse_judge_response('junk {"winner": "tie", "reason": ""} junk') == "tie"
    assert parse_judge_response("no json at all") is None


def test_elo_rater_updates():
    r = EloRater()
    r.record("a", "b", "1")
    assert r.rating("a") > 1000 > r.rating("b")
    before = r.rating("a")
    r.record("a", "b", "tie")
    assert r.rating("a") < before  # favorite loses points on a tie


def test_elo_tournament_better_model_wins():
    outputs = {
        "good": {f"p{i}": f"text {i}" for i in range(10)},
        "bad": {f"p{i}": f"text {i}" for i in range(10)},
    }

    def judge(prompt):
        # 'good' wins whenever it is model 1, loses otherwise? No — the
        # judge sees anonymized order; emulate a judge that recognizes the
        # good output by content: here identical, so alternate by marker.
        return '{"winner": "tie", "reason": "same"}'

    rater = run_elo_tournament(outputs, judge, rounds=2)
    assert abs(rater.rating("good") - rater.rating("bad")) < 1.0

    # Now a judge that always prefers 'good' regardless of position.
    def judge2(prompt):
        # model 1's text appears first in the prompt
        first = prompt.split("【Model 1 Output】:")[1].split("```markdown")[1]
        return (
            '{"winner": "1"}' if "GOODMARK" in first.split("```")[0]
            else '{"winner": "2"}'
        )

    outputs2 = {
        "good": {f"p{i}": f"GOODMARK {i}" for i in range(10)},
        "bad": {f"p{i}": f"bad {i}" for i in range(10)},
    }
    rater2 = run_elo_tournament(outputs2, judge2, rounds=2)
    assert rater2.rating("good") > rater2.rating("bad") + 50


# ---------------------------------------------------------------------------
# OmniDocBench sweep plumbing (fake parser)
# ---------------------------------------------------------------------------


def test_sweep_and_scoring(tmp_path):
    from dots_ocr_tpu.eval import omnidocbench as odb

    images = tmp_path / "images"
    images.mkdir()
    for i in range(3):
        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(images / f"page{i}.png")

    class FakeParser:
        def parse_file(self, path, output_dir="", prompt_mode="", fitz_preprocess=False):
            name = os.path.splitext(os.path.basename(path))[0]
            os.makedirs(output_dir, exist_ok=True)
            md = os.path.join(output_dir, f"{name}_nohf.md")
            with open(md, "w") as f:
                f.write(f"content of {name}")
            return [{"page_no": 0, "md_content_nohf_path": md}]

    out_dir = tmp_path / "out"
    out_dir.mkdir()
    results = odb.run_sweep(str(images), str(out_dir), parser=FakeParser(), num_thread=2)
    assert len(results) == 3
    assert os.path.exists(out_dir / "sweep_summary.json")
    summary = json.load(open(out_dir / "sweep_summary.json"))
    assert summary["succeeded"] == 3

    preds = odb.collect_nohf_markdown(results, str(out_dir / "md"))
    assert len(preds) == 3

    refs = tmp_path / "refs"
    refs.mkdir()
    for i in range(3):
        (refs / f"page{i}.md").write_text(f"content of page{i}")
    score = odb.score_against_references(preds, str(refs))
    assert score["overall"] == 0.0
