"""Benchmark-grade metric tests: TEDS, detection F1, per-category, order.

Every expected value is hand-computed so the metrics can be trusted to
reproduce the reference's published table columns
(/root/reference/assets/blog.md:419-432, 764-775: TEDS EN 88.6,
detection F1@.50:.95 0.845, per-category edit distances).
"""

import pytest

from dots_ocr_tpu.eval.metrics import (
    aggregate_layout_scores,
    bbox_iou,
    detection_f1,
    evaluate_layout_page,
    match_cells,
    parse_html_table,
    per_category_scores,
    reading_order_edit,
    sequence_edit_distance,
    teds,
    tree_edit_distance,
    tree_size,
)

T_AB = "<table><tr><td>a</td><td>b</td></tr></table>"


class TestTeds:
    def test_identical(self):
        assert teds(T_AB, T_AB) == 1.0

    def test_missing_cell(self):
        pred = "<table><tr><td>a</td></tr></table>"
        # trees: pred {root, table, tr, td} = 4 nodes; gt = 5 nodes;
        # TED = 1 insertion -> TEDS = 1 - 1/5
        assert teds(pred, T_AB) == pytest.approx(1 - 1 / 5)
        assert teds(T_AB, pred) == pytest.approx(1 - 1 / 5)  # symmetric

    def test_cell_text_difference(self):
        pred = "<table><tr><td>ab</td></tr></table>"
        gt = "<table><tr><td>ad</td></tr></table>"
        # rename cost = edit("ab","ad")/2 = 0.5; sizes 4 -> 1 - 0.5/4
        assert teds(pred, gt) == pytest.approx(1 - 0.5 / 4)
        assert teds(pred, gt, structure_only=True) == 1.0

    def test_colspan_mismatch_is_full_rename(self):
        pred = '<table><tr><td colspan="2">x</td></tr></table>'
        gt = "<table><tr><td>x</td></tr></table>"
        assert teds(pred, gt) == pytest.approx(1 - 1 / 4)

    def test_th_normalized_to_td(self):
        pred = "<table><tr><th>h</th></tr></table>"
        gt = "<table><tr><td>h</td></tr></table>"
        assert teds(pred, gt) == 1.0

    def test_empty_inputs(self):
        assert teds("", "") == 1.0
        assert teds("", T_AB) < 1.0

    def test_nested_structure(self):
        pred = "<table><thead><tr><td>h</td></tr></thead><tbody><tr><td>1</td></tr></tbody></table>"
        assert teds(pred, pred) == 1.0
        assert 0.0 < teds(pred, T_AB) < 1.0

    def test_whitespace_insensitive_cells(self):
        a = "<table><tr><td> a  b </td></tr></table>"
        b = "<table><tr><td>a b</td></tr></table>"
        assert teds(a, b) == 1.0

    def test_tree_edit_distance_zero_self(self):
        t = parse_html_table(T_AB)
        assert tree_edit_distance(t, t) == 0.0
        assert tree_size(t) == 5  # root, table, tr, td, td


def test_sequence_edit_distance():
    assert sequence_edit_distance([1, 2, 3], [1, 2, 3]) == 0
    assert sequence_edit_distance([1, 0], [0, 1]) == 2
    assert sequence_edit_distance([], [5, 6]) == 2
    assert sequence_edit_distance([1, 2, 3], [1, 3]) == 1


class TestDetectionF1:
    def setup_method(self):
        self.gt = [
            {"bbox": [0, 0, 10, 10], "category": "Text"},
            {"bbox": [20, 20, 30, 26], "category": "Table"},
        ]
        self.pred = [
            {"bbox": [0, 0, 10, 10], "category": "Text"},   # IoU 1.0
            {"bbox": [20, 20, 30, 30], "category": "Table"},  # IoU 0.6
        ]

    def test_iou(self):
        assert bbox_iou([0, 0, 10, 10], [0, 0, 10, 10]) == 1.0
        assert bbox_iou([20, 20, 30, 30], [20, 20, 30, 26]) == pytest.approx(0.6)
        assert bbox_iou([0, 0, 1, 1], [5, 5, 6, 6]) == 0.0

    def test_f1_thresholds(self):
        # thr <= 0.6 (3 thresholds): both match -> F1 1.0
        # thr > 0.6 (7 thresholds): one match -> P=R=0.5 -> F1 0.5
        out = detection_f1(self.pred, self.gt)
        assert out["f1@.50"] == 1.0
        assert out["f1@.75"] == 0.5
        assert out["f1@.50:.95"] == pytest.approx((3 * 1.0 + 7 * 0.5) / 10)

    def test_category_mismatch_blocks_match(self):
        pred = [{"bbox": [0, 0, 10, 10], "category": "Title"}]
        gt = [{"bbox": [0, 0, 10, 10], "category": "Text"}]
        assert detection_f1(pred, gt)["f1@.50"] == 0.0
        assert detection_f1(pred, gt, match_category=False)["f1@.50"] == 1.0

    def test_empty_cases(self):
        assert detection_f1([], [])["f1@.50:.95"] == 1.0
        assert detection_f1(self.pred, [])["f1@.50"] == 0.0
        assert detection_f1([], self.gt)["f1@.50"] == 0.0

    def test_greedy_matching_is_one_to_one(self):
        # two preds over one gt: only one may match
        pred = [
            {"bbox": [0, 0, 10, 10], "category": "Text"},
            {"bbox": [0, 0, 10, 9], "category": "Text"},
        ]
        gt = [{"bbox": [0, 0, 10, 10], "category": "Text"}]
        pairs = match_cells(pred, gt, 0.5)
        assert len(pairs) == 1
        assert pairs[0][:2] == (0, 0)  # highest IoU wins


class TestPerCategory:
    def test_matched_text_distance(self):
        pred = [{"bbox": [0, 0, 10, 10], "category": "Text", "text": "hello"}]
        gt = [{"bbox": [0, 0, 10, 10], "category": "Text", "text": "hallo"}]
        out = per_category_scores(pred, gt)
        assert out["text_edit"] == pytest.approx(0.2)  # 1 edit / 5 chars
        assert out["formula_edit"] is None

    def test_unmatched_gt_counts_as_miss(self):
        gt = [
            {"bbox": [0, 0, 10, 10], "category": "Text", "text": "abc"},
            {"bbox": [50, 50, 60, 60], "category": "Formula", "text": "x^2"},
        ]
        pred = [{"bbox": [0, 0, 10, 10], "category": "Text", "text": "abc"}]
        out = per_category_scores(pred, gt)
        assert out["text_edit"] == 0.0
        assert out["formula_edit"] == 1.0  # missed entirely

    def test_table_scored_by_teds(self):
        pred = [{"bbox": [0, 0, 9, 9], "category": "Table",
                 "text": "<table><tr><td>a</td></tr></table>"}]
        gt = [{"bbox": [0, 0, 10, 10], "category": "Table", "text": T_AB}]
        out = per_category_scores(pred, gt)
        assert out["table_edit"] == pytest.approx(1 / 5)  # 1 - TEDS(0.8)


class TestReadingOrder:
    def test_perfect_order(self):
        cells = [
            {"bbox": [0, 0, 10, 10], "category": "Text", "text": "a"},
            {"bbox": [0, 20, 10, 30], "category": "Text", "text": "b"},
        ]
        assert reading_order_edit(cells, cells) == 0.0

    def test_swapped_order(self):
        gt = [
            {"bbox": [0, 0, 10, 10], "category": "Text", "text": "a"},
            {"bbox": [0, 20, 10, 30], "category": "Text", "text": "b"},
        ]
        pred = [gt[1], gt[0]]
        # matched gt indices in pred order: [1, 0] vs [0, 1] -> 2 edits / 2
        assert reading_order_edit(pred, gt) == 1.0

    def test_no_matches_is_none(self):
        assert reading_order_edit(
            [{"bbox": [0, 0, 1, 1], "category": "Text"}],
            [{"bbox": [50, 50, 60, 60], "category": "Text"}],
        ) is None


def test_evaluate_and_aggregate_full_page():
    gt = [
        {"bbox": [0, 0, 10, 10], "category": "Text", "text": "hello"},
        {"bbox": [0, 20, 10, 30], "category": "Table", "text": T_AB},
    ]
    page = evaluate_layout_page(gt, gt)
    assert page["detection"]["f1@.50:.95"] == 1.0
    assert page["text_edit"] == 0.0
    assert page["table_teds"] == 1.0
    assert page["read_order_edit"] == 0.0
    agg = aggregate_layout_scores([page, page])
    assert agg["pages"] == 2
    assert agg["detection_f1@.50:.95"] == 1.0
    assert agg["table_teds"] == 1.0


def test_score_layout_against_gt(tmp_path):
    """omnidocbench --gt-json plumbing: per-page JSON in, column set out."""
    import json

    from dots_ocr_tpu.eval.omnidocbench import score_layout_against_gt

    cells = [
        {"bbox": [0, 0, 10, 10], "category": "Text", "text": "hello"},
        {"bbox": [0, 20, 10, 30], "category": "Table", "text": T_AB},
    ]
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    (gt_dir / "page1.json").write_text(json.dumps(cells))
    pred_path = tmp_path / "page1_pred.json"
    pred_path.write_text(json.dumps(cells))
    results = {"page1": {"layout_info_path": str(pred_path)},
               "missing": {"layout_info_path": str(tmp_path / "nope.json")}}
    agg = score_layout_against_gt(results, str(gt_dir))
    assert agg["pages"] == 1
    assert agg["detection_f1@.50:.95"] == 1.0
    assert agg["table_teds"] == 1.0
    assert agg["text_edit"] == 0.0


def test_teds_clamped_to_unit_interval():
    """Edit distance can exceed max(|T1|, |T2|) for structurally very
    different tables; similarity must clamp at 0, never go negative."""
    from dots_ocr_tpu.eval.metrics import teds

    deep = "<table><tr><td>" + "x" * 3 + "</td></tr></table>"
    wide = "<table>" + "".join(
        f"<tr><td>{c}</td><td>{c}</td><td>{c}</td></tr>" for c in "abcdefgh"
    ) + "</table>"
    nested = "<table>" + "<tbody>" * 8 + "<tr><td>q</td></tr>" + "</tbody>" * 8 + "</table>"
    for pred, gt in [(nested, wide), (wide, nested), (deep, wide)]:
        v = teds(pred, gt)
        assert 0.0 <= v <= 1.0, (pred[:30], gt[:30], v)


def test_hallucinated_tables_penalized():
    """Spurious predicted tables must lower table_teds (a fabricating
    model must not tie with a faithful one)."""
    from dots_ocr_tpu.eval.metrics import evaluate_layout_page

    tbl = "<table><tr><td>a</td></tr></table>"
    gt = [{"category": "Table", "bbox": [0, 0, 100, 100], "text": tbl}]
    clean = [{"category": "Table", "bbox": [0, 0, 100, 100], "text": tbl}]
    noisy = clean + [
        {"category": "Table", "bbox": [500 + i, 500, 600 + i, 600], "text": tbl}
        for i in range(3)
    ]
    a = evaluate_layout_page(clean, gt)["table_teds"]
    b = evaluate_layout_page(noisy, gt)["table_teds"]
    assert a == 1.0
    assert b < a
