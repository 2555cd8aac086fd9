"""OmniDocBench end2end protocol tests (eval/end2end.py).

Fixtures follow the OFFICIAL OmniDocBench.json shape (layout_dets with
category_type/text/latex/html/order/ignore + page_info.page_attribute) so
the scorer is exercised exactly as the published pipeline would be
(reference recipe: /root/reference/tools/eval_omnidocbench.md end2end.yaml,
match_method quick_match).
"""

import math

from dots_ocr_tpu.eval.end2end import (
    Element,
    format_table,
    gt_elements,
    pred_elements,
    quick_match,
    score_pages_end2end,
)


def _sample(dets, language="english", image="page_0.jpg", **info_extra):
    return {
        "layout_dets": dets,
        "page_info": {
            "image_path": image,
            "height": 1000,
            "width": 800,
            "page_attribute": {"language": language},
            **info_extra,
        },
    }


GT_TABLE = ("<table><tr><td>Name</td><td>Value</td></tr>"
            "<tr><td>alpha</td><td>1</td></tr></table>")


def _full_sample(image="page_0.jpg", language="english"):
    return _sample(
        [
            {"category_type": "title", "text": "Quarterly Report",
             "order": 0},
            {"category_type": "text_block",
             "text": "Revenue grew by twelve percent against the prior "
                     "year, driven by subscription renewals.",
             "order": 1},
            {"category_type": "equation_isolated",
             "latex": "E = m c^2", "order": 2},
            {"category_type": "table", "html": GT_TABLE, "order": 3},
            {"category_type": "header", "text": "CONFIDENTIAL", "order": 99},
        ],
        language=language,
        image=image,
    )


PERFECT_MD = (
    "# Quarterly Report\n\n"
    "Revenue grew by twelve percent against the prior year, driven by "
    "subscription renewals.\n\n"
    "$$E = m c^2$$\n\n"
    f"{GT_TABLE}\n"
)


class TestGtParsing:
    def test_categories_and_order(self):
        els = gt_elements(_full_sample())
        assert [e.category for e in els] == ["text", "text", "formula",
                                             "table"]
        assert [e.order for e in els] == [0, 1, 2, 3]

    def test_abandon_categories_excluded(self):
        els = gt_elements(_full_sample())
        assert all("CONFIDENTIAL" not in e.content for e in els)

    def test_ignore_flag_variants(self):
        s = _sample([
            {"category_type": "text_block", "text": "a", "ignore": "yes"},
            {"category_type": "text_block", "text": "b",
             "attribute": {"ignore": "true"}},
            {"category_type": "text_block", "text": "c"},
        ])
        els = gt_elements(s)
        assert [e.ignore for e in els] == [True, True, False]


class TestPredParsing:
    def test_segmentation(self):
        els = pred_elements(PERFECT_MD)
        assert [e.category for e in els] == ["text", "text", "formula",
                                             "table"]
        assert els[0].content == "Quarterly Report"
        assert els[2].content == "E = m c^2"

    def test_markdown_pipe_table_converts_to_html(self):
        els = pred_elements("| a | b |\n|---|---|\n| 1 | 2 |\n")
        assert els[0].category == "table"
        assert "<td>a</td>" in els[0].content

    def test_images_stripped_code_kept(self):
        els = pred_elements(
            "![](data:image/png;base64,xyz)\n\n```py\nx = 1\n```\n"
        )
        assert len(els) == 1
        assert els[0].category == "text"
        assert "x = 1" in els[0].content

    def test_display_math_bracket_form(self):
        els = pred_elements("\\[ \\alpha + \\beta \\]")
        assert els[0].category == "formula"


class TestQuickMatch:
    def test_exact_pairs(self):
        gts = gt_elements(_full_sample())
        preds = pred_elements(PERFECT_MD)
        pairs, extra = quick_match(gts, preds)
        assert all(p is not None for _, p in pairs)
        assert extra == []

    def test_split_pred_merged_back(self):
        gts = [Element("text", "one two three four five six seven eight", 0)]
        preds = [
            Element("text", "one two three four", 0),
            Element("text", "five six seven eight", 1),
        ]
        pairs, extra = quick_match(gts, preds)
        assert pairs[0][1] is not None
        assert "eight" in pairs[0][1].content
        assert extra == []

    def test_unrelated_not_matched(self):
        gts = [Element("text", "alpha beta gamma delta", 0)]
        preds = [Element("text", "zzzzzzzzzzzzzzzzzzzzzzzz", 0)]
        pairs, extra = quick_match(gts, preds)
        assert pairs[0][1] is None
        assert len(extra) == 1

    def test_category_families_do_not_cross(self):
        gts = [Element("formula", "x + y", 0)]
        preds = [Element("text", "x + y", 0)]
        pairs, _ = quick_match(gts, preds)
        assert pairs[0][1] is None


class TestScoring:
    def test_perfect_prediction_all_zero(self):
        scores = score_pages_end2end(
            [_full_sample()], {"page_0": PERFECT_MD}
        )
        assert scores["text_block_Edit_dist_EN"] == 0.0
        assert scores["display_formula_Edit_dist_EN"] == 0.0
        assert scores["table_Edit_dist_EN"] == 0.0
        assert scores["table_TEDS_EN"] == 100.0
        assert scores["reading_order_Edit_dist_EN"] == 0.0
        assert scores["overall_EN"] == 0.0
        assert scores["display_formula_CDM_EN"] == "-"

    def test_gt_markdown_roundtrip_scores_zero(self):
        # weights_day's end2end_scorer stage feeds GT back through
        # gt_to_markdown as the prediction set; the protocol score must be
        # exactly zero or the matching/normalization chain has drifted.
        from dots_ocr_tpu.eval.end2end import gt_to_markdown

        sample = _full_sample()
        scores = score_pages_end2end(
            [sample], {"page_0": gt_to_markdown(sample)}
        )
        assert scores["overall_EN"] == 0.0
        assert scores["table_TEDS_EN"] == 100.0

    def test_overall_is_mean_of_four_columns(self):
        md = PERFECT_MD.replace("twelve", "thirteen")
        scores = score_pages_end2end([_full_sample()], {"page_0": md})
        parts = [
            scores["text_block_Edit_dist_EN"],
            scores["display_formula_Edit_dist_EN"],
            scores["table_Edit_dist_EN"],
            scores["reading_order_Edit_dist_EN"],
        ]
        assert math.isclose(scores["overall_EN"], sum(parts) / 4)
        assert scores["text_block_Edit_dist_EN"] > 0

    def test_swapped_order_penalizes_reading_order_only(self):
        md = (
            "Revenue grew by twelve percent against the prior year, driven "
            "by subscription renewals.\n\n"
            "# Quarterly Report\n\n"
            "$$E = m c^2$$\n\n"
            f"{GT_TABLE}\n"
        )
        scores = score_pages_end2end([_full_sample()], {"page_0": md})
        assert scores["text_block_Edit_dist_EN"] == 0.0
        assert scores["reading_order_Edit_dist_EN"] > 0.0

    def test_missing_gt_element_scores_as_total_miss(self):
        md = PERFECT_MD.replace("$$E = m c^2$$", "")
        scores = score_pages_end2end([_full_sample()], {"page_0": md})
        assert scores["display_formula_Edit_dist_EN"] == 1.0

    def test_hallucinated_pred_penalizes(self):
        md = PERFECT_MD + "\n\nEntirely invented trailing paragraph here.\n"
        base = score_pages_end2end([_full_sample()],
                                   {"page_0": PERFECT_MD})
        scores = score_pages_end2end([_full_sample()], {"page_0": md})
        assert scores["text_block_Edit_dist_EN"] > \
            base["text_block_Edit_dist_EN"]

    def test_chinese_page_goes_to_ch_columns(self):
        s = _sample(
            [{"category_type": "text_block", "text": "这是一个测试段落。",
              "order": 0},
             {"category_type": "text_block", "text": "第二个段落在这里。",
              "order": 1}],
            language="simplified_chinese",
            image="page_1.jpg",
        )
        scores = score_pages_end2end(
            [s], {"page_1": "这是一个测试段落。\n\n第二个段落在这里。\n"}
        )
        assert scores["text_block_Edit_dist_CH"] == 0.0
        assert "text_block_Edit_dist_EN" not in scores
        assert scores["overall_CH"] == 0.0

    def test_ignored_gt_elements_not_scored(self):
        s = _sample([
            {"category_type": "text_block", "text": "visible text block",
             "order": 0},
            {"category_type": "text_block", "text": "ignored low quality",
             "order": 1, "ignore": "yes"},
        ])
        scores = score_pages_end2end([s], {"page_0": "visible text block\n"})
        assert scores["text_block_Edit_dist_EN"] == 0.0

    def test_attribute_splits_present(self):
        s = _full_sample()
        s["page_info"]["data_source"] = "book"
        scores = score_pages_end2end([s], {"page_0": PERFECT_MD})
        assert "data_source: book" in scores["attributes"]

    def test_format_table_contains_published_rows(self):
        scores = score_pages_end2end([_full_sample()],
                                     {"page_0": PERFECT_MD})
        table = format_table(scores)
        for row in ("text_block_Edit_dist_EN", "table_TEDS_EN",
                    "reading_order_Edit_dist_CH", "overall_EN",
                    "display_formula_CDM_EN"):
            assert row in table
