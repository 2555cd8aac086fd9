"""Parser pipeline tests with a deterministic fake engine.

Exercises the full artifact pipeline (resize -> prompt -> inference ->
post-process -> json/md/jpg/_nohf.md + .jsonl manifest) without a model —
the fake-decode-backend strategy SURVEY.md §4 calls for.
"""

import io
import json
import os

import numpy as np
import pytest
from PIL import Image

from dots_ocr_tpu.engine.engine import RequestStats
from dots_ocr_tpu.parser import DotsMOCRParser, DotsOCRParser


class FakeEngine:
    """Emits a canned layout JSON in model-input coordinates."""

    default_max_new_tokens = 1024

    def __init__(self, response=None):
        self.last_stats = RequestStats(prompt_tokens=10, completion_tokens=20)
        self.calls = []
        self._response = response

    def generate_one(self, prompt, images=(), **kwargs):
        return self.generate_batch([prompt], [list(images)], **kwargs)[0]

    def generate_batch(self, prompts, images_per_prompt, **kwargs):
        self.calls.append({"prompts": prompts, "kwargs": kwargs})
        if self._response is not None:
            return [self._response] * len(prompts)
        out = []
        for images in images_per_prompt:
            # Model sees the smart-resized image; emit coords in that space.
            from dots_ocr_tpu.utils.resize import smart_resize

            img = images[0]
            ih, iw = smart_resize(img.height, img.width)
            cells = [
                {
                    "bbox": [0, 0, iw // 2, ih // 2],
                    "category": "Title",
                    "text": "# Fake Title",
                },
                {
                    "bbox": [0, ih // 2, iw, ih],
                    "category": "Text",
                    "text": "Body text.",
                },
            ]
            out.append(json.dumps(cells))
        return out


@pytest.fixture
def image_file(tmp_path):
    p = tmp_path / "page.png"
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(200, 255, (420, 600, 3), np.uint8)).save(p)
    return str(p)


@pytest.fixture
def pdf_file(tmp_path):
    p = tmp_path / "doc.pdf"
    pages = [
        Image.new("RGB", (300, 200), (250, 250, 250)),
        Image.new("RGB", (300, 200), (240, 240, 240)),
    ]
    buf = io.BytesIO()
    pages[0].save(buf, format="PDF", save_all=True, append_images=pages[1:])
    p.write_bytes(buf.getvalue())
    return str(p)


def _parser(tmp_path, engine=None, **kw):
    return DotsOCRParser(
        engine=engine or FakeEngine(),
        output_dir=str(tmp_path / "out"),
        **kw,
    )


def test_parse_image_artifacts(tmp_path, image_file):
    parser = _parser(tmp_path)
    results = parser.parse_file(image_file, prompt_mode="prompt_layout_all_en")
    assert len(results) == 1
    r = results[0]
    assert os.path.exists(r["layout_info_path"])
    assert os.path.exists(r["layout_image_path"])
    assert os.path.exists(r["md_content_path"])
    assert os.path.exists(r["md_content_nohf_path"])
    # bboxes are rescaled back to original-image coordinates
    cells = json.load(open(r["layout_info_path"]))
    assert cells[1]["bbox"][2] <= 600 and cells[1]["bbox"][3] <= 420
    md = open(r["md_content_path"]).read()
    assert "# Fake Title" in md and "Body text." in md
    # manifest
    manifest = os.path.join(parser.output_dir, "page.jsonl")
    assert os.path.exists(manifest)
    lines = [json.loads(line) for line in open(manifest)]
    assert lines[0]["page_no"] == 0


def test_parse_image_records_input_dims(tmp_path, image_file):
    parser = _parser(tmp_path)
    r = parser.parse_file(image_file)[0]
    assert r["input_width"] % 28 == 0 and r["input_height"] % 28 == 0


def test_parse_pdf_multipage(tmp_path, pdf_file):
    parser = _parser(tmp_path)
    results = parser.parse_file(pdf_file, prompt_mode="prompt_layout_all_en")
    assert len(results) == 2
    assert [r["page_no"] for r in results] == [0, 1]
    assert all("_page_" in r["layout_info_path"] for r in results)


def test_parse_ocr_mode_raw_markdown(tmp_path, image_file):
    engine = FakeEngine(response="plain extracted text")
    parser = _parser(tmp_path, engine=engine)
    r = parser.parse_file(image_file, prompt_mode="prompt_ocr")[0]
    assert "layout_info_path" not in r
    assert open(r["md_content_path"]).read() == "plain extracted text"


def test_parse_layout_only_no_md(tmp_path, image_file):
    response = json.dumps([{"bbox": [0, 0, 56, 56], "category": "Text"}])
    parser = _parser(tmp_path, engine=FakeEngine(response=response))
    r = parser.parse_file(image_file, prompt_mode="prompt_layout_only_en")[0]
    assert "layout_info_path" in r
    assert "md_content_path" not in r


def test_parse_grounding_appends_bbox(tmp_path, image_file):
    engine = FakeEngine(response="grounded text")
    parser = _parser(tmp_path, engine=engine)
    parser.parse_file(
        image_file, prompt_mode="prompt_grounding_ocr", bbox=[10, 10, 100, 100]
    )
    prompt = engine.calls[0]["prompts"][0]
    assert "Bounding Box" in prompt
    assert prompt.rstrip().endswith("]")


def test_parse_salvage_path_sets_filtered(tmp_path, image_file):
    broken = '[{"bbox": [1,2,3,4], "category": "Text", "text": "rescued"}, {"bbox": [9'
    parser = _parser(tmp_path, engine=FakeEngine(response=broken))
    r = parser.parse_file(image_file, prompt_mode="prompt_layout_all_en")[0]
    assert r.get("filtered") is True
    assert "rescued" in open(r["md_content_path"]).read()


def test_custom_prompt_bypasses_postprocess(tmp_path, image_file):
    engine = FakeEngine(response="anything goes")
    parser = _parser(tmp_path, engine=engine)
    r = parser.parse_file(
        image_file, prompt_mode="prompt_layout_all_en", custom_prompt="do x"
    )[0]
    assert engine.calls[0]["prompts"][0] == "do x"
    assert open(r["md_content_path"]).read() == "anything goes"


def test_temperature_override_passed(tmp_path, image_file):
    engine = FakeEngine(response="t")
    parser = _parser(tmp_path, engine=engine)
    parser.parse_file(image_file, prompt_mode="prompt_ocr", temperature=0.9)
    assert engine.calls[0]["kwargs"]["temperature"] == 0.9


def test_fitz_preprocess_upscales(tmp_path, image_file):
    engine = FakeEngine(response="t")
    parser = _parser(tmp_path, engine=engine)
    parser.parse_file(image_file, prompt_mode="prompt_ocr", fitz_preprocess=True)
    # Upsample 200/72 then smart-resize: engine saw a bigger image than orig.
    # (server-side resize happens in engine; parser passed a resized image)
    assert engine.calls


def test_mocr_alias():
    assert DotsMOCRParser is DotsOCRParser


def test_unsupported_extension_raises(tmp_path):
    parser = _parser(tmp_path)
    bad = tmp_path / "f.txt"
    bad.write_text("x")
    with pytest.raises(ValueError, match="not supported"):
        parser.parse_file(str(bad))


def test_pixel_bound_asserts(tmp_path):
    with pytest.raises(AssertionError):
        DotsOCRParser(engine=FakeEngine(), min_pixels=100)
    with pytest.raises(AssertionError):
        DotsOCRParser(engine=FakeEngine(), max_pixels=10**9)


def test_seed_passed_per_page(tmp_path, pdf_file):
    """Parser seed knob: page i submits seed + i (reproducible eval
    sweeps over the serving engine's position-keyed sampling chains)."""
    engine = FakeEngine(response="s")
    parser = _parser(tmp_path, engine=engine, seed=100)
    parser.parse_file(pdf_file, prompt_mode="prompt_ocr")
    seeds = sorted(c["kwargs"]["seed"] for c in engine.calls)
    assert seeds == [100 + i for i in range(len(seeds))]


def test_no_seed_by_default(tmp_path, image_file):
    engine = FakeEngine(response="s")
    parser = _parser(tmp_path, engine=engine)
    parser.parse_file(image_file, prompt_mode="prompt_ocr")
    assert engine.calls[0]["kwargs"]["seed"] is None


class FakeContinuousEngine(FakeEngine):
    """FakeEngine + the continuous-engine surface (`submit`) that makes
    the parser route multi-page PDFs through ONE generate_batch call."""

    def submit(self, *a, **kw):  # pragma: no cover - presence-only marker
        raise NotImplementedError

    def generate_batch(self, prompts, images_per_prompt, **kwargs):
        return super().generate_batch(prompts, images_per_prompt, **kwargs)


def test_local_pdf_batches_through_engine(tmp_path, pdf_file):
    """A local continuous engine gets the whole PDF as one batch (the
    scheduler overlaps encoders/prefills/decodes across pages) — not a
    serial per-page generate_one loop."""
    engine = FakeContinuousEngine()
    parser = _parser(tmp_path, engine=engine, seed=100)
    results = parser.parse_file(pdf_file, prompt_mode="prompt_layout_all_en")
    assert len(engine.calls) == 1
    call = engine.calls[0]
    assert len(call["prompts"]) == 2
    # per-request seed list, matching the serial path's seed + page_no
    assert call["kwargs"]["seed"] == [100, 101]
    # full artifact pipeline ran for each page
    assert [r["page_no"] for r in results] == [0, 1]
    for r in results:
        assert os.path.exists(r["layout_info_path"])
        assert os.path.exists(r["md_content_path"])
        assert r["input_height"] > 0 and r["input_width"] > 0


def test_local_pdf_batched_unseeded(tmp_path, pdf_file):
    engine = FakeContinuousEngine()
    parser = _parser(tmp_path, engine=engine)
    parser.parse_file(pdf_file, prompt_mode="prompt_ocr")
    assert len(engine.calls) == 1
    assert engine.calls[0]["kwargs"]["seed"] is None


def test_local_single_page_pdf_stays_serial(tmp_path):
    """One-page PDFs take the plain path (no batch bookkeeping)."""
    p = tmp_path / "one.pdf"
    buf = io.BytesIO()
    Image.new("RGB", (300, 200), (250, 250, 250)).save(buf, format="PDF")
    p.write_bytes(buf.getvalue())
    engine = FakeContinuousEngine(response="text")
    parser = _parser(tmp_path, engine=engine)
    results = parser.parse_file(str(p), prompt_mode="prompt_ocr")
    assert len(results) == 1
    assert len(engine.calls) == 1  # via generate_one -> generate_batch
