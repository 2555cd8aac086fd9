"""OutputCleaner salvage tests: every rule of the reference pipeline
(dots_ocr/utils/output_cleaner.py) exercised with hand-written fixtures."""

import json

from dots_ocr_tpu.utils.repair import (
    OutputCleaner,
    clean_list_data,
    clean_string_data,
    dedup_repeats,
)


def _cell(b, cat="Text", text="t"):
    return {"bbox": b, "category": cat, "text": text}


class TestListCleaning:
    def test_three_coord_bbox_keeps_payload(self):
        data = [{"bbox": [1, 2, 3], "category": "Text", "text": "keep me"}]
        result = clean_list_data(data)
        assert result.cleaned_data == [{"category": "Text", "text": "keep me"}]

    def test_three_coord_bbox_no_payload_removed(self):
        result = clean_list_data([{"bbox": [1, 2, 3]}])
        assert result.cleaned_data == []

    def test_four_coord_kept_verbatim(self):
        data = [_cell([1, 2, 3, 4])]
        result = clean_list_data(data)
        assert result.cleaned_data == data
        assert result.cleaned_data[0] is not data[0]  # copied

    def test_bad_bbox_removed(self):
        assert clean_list_data([{"bbox": "nope", "category": "Text"}]).cleaned_data == []
        assert clean_list_data([{"bbox": [1, 2, 3, 4, 5], "category": "T"}]).cleaned_data == []

    def test_no_bbox_kept_with_category(self):
        assert clean_list_data([{"category": "Text"}]).cleaned_data == [{"category": "Text"}]
        assert clean_list_data([{"text": "x"}]).cleaned_data == []

    def test_non_dict_removed(self):
        assert clean_list_data(["str", 5, None]).cleaned_data == []


class TestStringCleaning:
    def test_valid_json_passes_through(self):
        cells = [_cell([1, 2, 3, 4])]
        result = clean_string_data(json.dumps(cells))
        assert result.success and result.cleaned_data == cells

    def test_truncated_tail_dropped(self):
        s = '[{"bbox": [1,2,3,4], "category": "Text", "text": "a"}, {"bbox": [5,6'
        result = clean_string_data(s)
        assert result.success
        assert result.cleaned_data == [_cell([1, 2, 3, 4], text="a")]

    def test_lone_incomplete_dict_rebuilt(self):
        s = '[{"bbox": [10, 20, 30, 40], "category": "Table", "text": "partial tex'
        result = clean_string_data(s)
        assert result.success
        # The bracket-close step appends ']' before the rebuild regex runs,
        # so the salvaged text carries it (same as the reference pipeline).
        assert result.cleaned_data == [
            {"bbox": [10, 20, 30, 40], "category": "Table", "text": "partial tex]"}
        ]

    def test_lone_incomplete_dict_without_category_defaults_text(self):
        s = '[{"bbox": [1, 2, 3, 4], "te'
        result = clean_string_data(s)
        assert result.success
        assert result.cleaned_data == [{"bbox": [1, 2, 3, 4], "category": "Text"}]

    def test_exact_duplicate_dicts_removed(self):
        cell = '{"bbox": [1,2,3,4], "category": "Text", "text": "dup"}'
        s = "[" + ", ".join([cell] * 3 + ['{"bbox": [9,9,9,9], "category": "Title", "text": "u"}']) + "]"
        result = clean_string_data(s)
        assert result.success
        assert len(result.cleaned_data) == 2

    def test_unterminated_array_closed(self):
        s = '[{"bbox": [1,2,3,4], "category": "Text", "text": "a"}, {"bbox": [5,6,7,8], "category": "Text", "text": "b"},'
        result = clean_string_data(s)
        assert result.success
        # not "]"-terminated -> tail truncation drops the LAST complete dict
        # (reference semantics: rfind('{"bbox":') truncation runs first)
        assert result.cleaned_data == [_cell([1, 2, 3, 4], text="a")]

    def test_missing_delimiter_lookahead_semantics(self):
        # The reference regex only repairs '}{'-junctions NOT followed by a
        # quote; '}{"' is left untouched (and later salvaged per-object).
        s = '[{"bbox": [1,2,3,4], "category": "Text", "text": "a"}{"bbox": [5,6,7,8], "category": "Text", "text": "b"}]'
        result = clean_string_data(s)
        assert result.success
        assert len(result.cleaned_data) == 2  # salvaged by per-object extraction

    def test_hopeless_input_fails_gracefully(self):
        result = clean_string_data("complete garbage with no json at all")
        assert not result.success
        assert result.cleaned_data == []


class TestDedupRepeats:
    def test_pair_repeated_5x_keeps_first(self):
        items = [_cell([i, i, i + 1, i + 1], text="loop") for i in range(5)]
        # different bboxes, same category+text pair 5x -> keep first only
        out = dedup_repeats(items)
        assert len(out) == 1

    def test_pair_repeated_4x_kept(self):
        items = [_cell([i, i, i + 1, i + 1], text="ok") for i in range(4)]
        assert len(dedup_repeats(items)) == 4

    def test_bbox_repeated_2x_keeps_first(self):
        items = [_cell([1, 2, 3, 4], text="a"), _cell([1, 2, 3, 4], text="b")]
        out = dedup_repeats(items)
        assert out == [items[0]]

    def test_short_list_skipped(self):
        items = [_cell([1, 2, 3, 4])]
        assert dedup_repeats(items) == items


class TestCleanModelOutput:
    def test_list_input(self):
        cleaner = OutputCleaner()
        out = cleaner.clean_model_output([_cell([1, 2, 3, 4])])
        assert out == [_cell([1, 2, 3, 4])]

    def test_string_input_with_loop_suppression(self):
        cell = _cell([7, 7, 8, 8], text="looping")
        payload = json.dumps([cell] * 6)
        # exact duplicates are removed at the string stage already
        out = OutputCleaner().clean_model_output(payload)
        assert out == [cell]

    def test_failure_returns_empty_list(self):
        out = OutputCleaner().clean_model_output("no json here")
        assert out == []

    def test_jsonl_batch(self, tmp_path):
        p = tmp_path / "preds.jsonl"
        rows = [
            {"predict": json.dumps([_cell([1, 2, 3, 4])])},
            {"predict": [_cell([5, 6, 7, 8])]},
        ]
        p.write_text("\n".join(json.dumps(r) for r in rows))
        cleaner = OutputCleaner()
        records = cleaner.clean_jsonl(str(p))
        assert len(records) == 2
        assert all("predict_resized" in r for r in records)
        assert (tmp_path / "preds_filtered.jsonl").exists()
        report = cleaner.report()
        assert report["successful"] == 2
