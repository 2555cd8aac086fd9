"""Headless tests for the demo-UI callback logic (no gradio needed).

The reference's UIs carry their logic inline and untested; here every
callback is a pure function in dots_ocr_tpu.ui.callbacks, tested against a
fake parser — including the no-file early return whose wrong arity crashed
the round-1 app.
"""

import json
import os
import zipfile

import pytest

from dots_ocr_tpu.ui import callbacks as cb


class FakeParser:
    """Writes realistic artifacts like DotsOCRParser.parse_file."""

    def __init__(self, out_pages=2):
        self.out_pages = out_pages
        self.calls = []

    def parse_file(self, input_path, output_dir=None, **kwargs):
        self.calls.append(kwargs)
        recs = []
        os.makedirs(output_dir, exist_ok=True)
        for i in range(self.out_pages):
            md = os.path.join(output_dir, f"page{i}.md")
            js = os.path.join(output_dir, f"page{i}.json")
            img = os.path.join(output_dir, f"page{i}.jpg")
            open(md, "w").write(f"# page {i}")
            json.dump([{"bbox": [0, 0, 1, 1], "category": "Text",
                        "text": f"t{i}"}], open(js, "w"))
            open(img, "wb").write(b"\xff\xd8fake")
            recs.append({
                "page_no": i,
                "md_content_path": md,
                "layout_info_path": js,
                "layout_image_path": img,
            })
        return recs


def test_parse_document_no_file_has_full_arity():
    out = cb.parse_document(None, "prompt_ocr", "", "localhost", 8000)
    assert len(out) == 6  # regression: round-1 returned 5 for 6 outputs
    assert out[0] is None and out[5] == []
    assert out[4].get("__type__") == "update"


def test_parse_document_multipage(tmp_path):
    f = tmp_path / "doc.pdf"
    f.write_bytes(b"%PDF fake")
    parser = FakeParser(out_pages=3)
    img, md, js, zip_path, slider, pages = cb.parse_document(
        str(f), "prompt_layout_all_en", "", "localhost", 8000, parser=parser
    )
    assert md == "# page 0"
    assert json.loads(js)[0]["category"] == "Text"
    assert len(pages) == 3
    assert slider["maximum"] == 3 and slider["visible"] is True
    with zipfile.ZipFile(zip_path) as zf:
        assert len(zf.namelist()) == 9  # 3 pages x (md, json, jpg)
    # per-prompt policy: layout prompt -> temperature 0.1
    assert parser.calls[0]["temperature"] == pytest.approx(0.1)


def test_parse_document_svg_policy(tmp_path):
    f = tmp_path / "img.png"
    f.write_bytes(b"fake")
    parser = FakeParser(out_pages=1)
    cb.parse_document(str(f), "prompt_image_to_svg", "", "x", 1, parser=parser)
    assert parser.calls[0]["temperature"] == pytest.approx(0.9)
    assert parser.calls[0]["fitz_preprocess"] is False


def test_show_page_bounds():
    pages = [{"image": "a", "md": "m0", "json": "j0"},
             {"image": "b", "md": "m1", "json": "j1"}]
    assert cb.show_page(2, pages) == ("b", "m1", "j1")
    assert cb.show_page(99, pages) == ("b", "m1", "j1")  # clamped
    assert cb.show_page(0, pages) == ("a", "m0", "j0")  # clamped
    assert cb.show_page(1, []) == (None, "", "")


def test_server_routing():
    assert cb.server_for_prompt("prompt_image_to_svg")["port"] == 8001
    assert cb.server_for_prompt("prompt_ocr")["port"] == 8000


def test_annotation_to_bbox():
    ann = {"boxes": [{"xmin": 1.2, "ymin": 3, "xmax": 40, "ymax": 50}]}
    assert cb.annotation_to_bbox(ann) == [1, 3, 40, 50]
    assert cb.annotation_to_bbox(None) is None
    assert cb.annotation_to_bbox({"boxes": []}) is None
    assert cb.annotation_to_bbox({"boxes": [{"xmin": 1}]}) is None


def test_parse_with_bbox(tmp_path):
    f = tmp_path / "img.png"
    f.write_bytes(b"fake")

    class GroundingParser(FakeParser):
        def parse_file(self, input_path, output_dir=None, **kwargs):
            assert kwargs["prompt_mode"] == "prompt_grounding_ocr"
            assert kwargs["bbox"] == [5, 6, 70, 80]
            return super().parse_file(input_path, output_dir=output_dir)

    md, status = cb.parse_with_bbox(
        str(f), {"boxes": [{"xmin": 5, "ymin": 6, "xmax": 70, "ymax": 80}]},
        "localhost", 8000, parser=GroundingParser(out_pages=1),
    )
    assert md == "# page 0"
    assert "bbox=[5, 6, 70, 80]" in status
    assert cb.parse_with_bbox(None, None, "x", 1) == ("", "upload an image first")
    assert cb.parse_with_bbox(str(f), None, "x", 1) == ("", "draw a box first")


# ---------------------------------------------------------------------------
# Batch editing (manager-level + callback-level)
# ---------------------------------------------------------------------------


@pytest.fixture
def done_manager(tmp_path):
    from dots_ocr_tpu.batch.jobs import BatchJobManager

    mgr = BatchJobManager(
        parser_factory=lambda: FakeParser(out_pages=2),
        output_dir=str(tmp_path / "batch"),
        manifest_path=str(tmp_path / "batch" / "jobs.jsonl"),
        max_concurrency=1,
    )
    src = tmp_path / "in.png"
    src.write_bytes(b"fake")
    mgr.start()
    rid = mgr.submit(str(src))
    assert mgr.wait_all(timeout=30)
    mgr.stop(wait=True)
    assert mgr.result(rid).status == "done"
    return mgr, rid


def test_save_edit_and_get_content(done_manager):
    mgr, rid = done_manager
    orig, edited = mgr.get_content(rid, 0, "md")
    assert orig == "# page 0" and not edited

    path = mgr.save_edit(rid, 0, "md", "# EDITED page 0")
    assert os.path.dirname(path).endswith("edited")
    got, edited = mgr.get_content(rid, 0, "md")
    assert got == "# EDITED page 0" and edited
    # page 1 untouched
    got1, edited1 = mgr.get_content(rid, 1, "md")
    assert got1 == "# page 1" and not edited1


def test_edited_aware_exports(done_manager):
    mgr, rid = done_manager
    mgr.save_edit(rid, 0, "md", "# EDITED")
    r = mgr.result(rid)
    with zipfile.ZipFile(r.export_path) as zf:
        assert zf.read("page0.md").decode() == "# EDITED"  # original name
        assert zf.read("page1.md").decode() == "# page 1"
    all_zip = mgr.export_all_zip()
    with zipfile.ZipFile(all_zip) as zf:
        assert zf.read(f"{rid}/page0.md").decode() == "# EDITED"


def test_edits_survive_restart(done_manager, tmp_path):
    from dots_ocr_tpu.batch.jobs import BatchJobManager

    mgr, rid = done_manager
    mgr.save_edit(rid, 0, "json", '[{"bbox": [1,2,3,4]}]')
    reloaded = BatchJobManager(
        parser_factory=lambda: FakeParser(),
        output_dir=mgr.output_dir,
        manifest_path=mgr.manifest_path,
    )
    got, edited = reloaded.get_content(rid, 0, "json")
    assert edited and json.loads(got)[0]["bbox"] == [1, 2, 3, 4]


def test_save_edit_unknown_rid_raises(done_manager):
    mgr, _ = done_manager
    with pytest.raises(KeyError):
        mgr.save_edit("nope", 0, "md", "x")
    with pytest.raises(ValueError):
        mgr.save_edit("nope", 0, "html", "x")


def test_callback_save_and_load(done_manager):
    mgr, rid = done_manager
    status = cb.save_result_edits(mgr, rid, 0, "new md", '[{"a": 1}]')
    assert status == "saved: md, json"
    md, js, state = cb.load_result_content(mgr, rid, 0)
    assert md == "new md" and json.loads(js) == [{"a": 1}] and state == "edited"
    # invalid JSON: markdown still saved, json rejected
    status = cb.save_result_edits(mgr, rid, 0, "md2", "{broken")
    assert "invalid JSON" in status
    md, js, _ = cb.load_result_content(mgr, rid, 0)
    assert md == "md2" and json.loads(js) == [{"a": 1}]
    assert cb.load_result_content(mgr, "", 0)[2] == "pick a result"


def test_progress_and_rows(done_manager):
    mgr, rid = done_manager
    rows = cb.result_rows(mgr)
    assert rows and rows[0][0] == rid and rows[0][2] == "done"
    assert "done 1" in cb.progress_text(mgr)


# ---------------------------------------------------------------------------
# Streamlit callbacks
# ---------------------------------------------------------------------------


def _layout_response(w, h):
    import json

    return json.dumps([
        {"bbox": [0, 0, w // 2, h // 2], "category": "Text", "text": "hello"},
    ])


def test_process_layout_response_layout_mode():
    import numpy as np
    from PIL import Image

    from dots_ocr_tpu.ui.callbacks import process_layout_response

    img = Image.fromarray(np.zeros((56, 84, 3), np.uint8))
    view = process_layout_response(
        img, _layout_response(84, 56), "prompt_layout_all_en", 84, 56
    )
    assert view["kind"] == "layout"
    assert view["markdown"] is not None
    assert view["image"].size == img.size
    assert view["cells"][0]["category"] == "Text"


def test_process_layout_response_layout_only_has_no_md():
    import numpy as np
    from PIL import Image

    from dots_ocr_tpu.ui.callbacks import process_layout_response

    img = Image.fromarray(np.zeros((56, 84, 3), np.uint8))
    view = process_layout_response(
        img, _layout_response(84, 56), "prompt_layout_only_en", 84, 56
    )
    assert view["kind"] == "layout" and view["markdown"] is None


def test_process_layout_response_error_and_invalid():
    import numpy as np
    from PIL import Image

    from dots_ocr_tpu.ui.callbacks import process_layout_response

    img = Image.fromarray(np.zeros((56, 84, 3), np.uint8))
    assert process_layout_response(img, None, "prompt_layout_all_en", 84, 56)[
        "kind"
    ] == "error"
    view = process_layout_response(
        img, "not json {", "prompt_layout_all_en", 84, 56
    )
    assert view["kind"] == "invalid" and view["raw"] == "not json {"
    # Non-layout prompts pass raw text through as markdown.
    assert process_layout_response(img, "plain *md*", "prompt_ocr", 84, 56)[
        "kind"
    ] == "text"


def test_resolve_image_input_precedence(tmp_path):
    import numpy as np
    from PIL import Image

    from dots_ocr_tpu.ui.callbacks import resolve_image_input

    p = tmp_path / "x.png"
    Image.fromarray(np.zeros((30, 40, 3), np.uint8)).save(p)
    img, src = resolve_image_input(None, str(p), "")
    assert img is not None and src == str(p)
    img, src = resolve_image_input(None, "", "")
    assert img is None and "no image" in src
    img, src = resolve_image_input(None, str(tmp_path / "missing.png"), "")
    assert img is None and "failed" in src


# ---------------------------------------------------------------------------
# Annotation flow
# ---------------------------------------------------------------------------


def test_validate_annotation():
    from dots_ocr_tpu.ui.callbacks import validate_annotation

    assert validate_annotation(None) == (None, "")
    assert validate_annotation({"boxes": []}) == (None, "")
    bbox, err = validate_annotation(
        {"boxes": [{"xmin": 1, "ymin": 2, "xmax": 30, "ymax": 40}]}
    )
    assert bbox == [1, 2, 30, 40] and err == ""
    _, err = validate_annotation(
        {"boxes": [{"xmin": 0, "ymin": 0, "xmax": 1, "ymax": 1}] * 2}
    )
    assert "exactly one" in err
    _, err = validate_annotation(
        {"boxes": [{"xmin": 30, "ymin": 2, "xmax": 1, "ymax": 40}]}
    )
    assert "invalid box" in err


def test_parse_annotation_flow_guards():
    from dots_ocr_tpu.ui.callbacks import parse_annotation_flow

    out = parse_annotation_flow(None, None, "prompt_ocr", "localhost", 8000)
    assert out[3] == "upload an image first"
    out = parse_annotation_flow(
        "/tmp/x.png",
        {"boxes": [{"xmin": 0, "ymin": 0, "xmax": 1, "ymax": 1}] * 2},
        "prompt_ocr", "localhost", 8000,
    )
    assert "exactly one" in out[3]
