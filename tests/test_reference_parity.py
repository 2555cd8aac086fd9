"""Differential byte-parity tests against the ACTUAL reference code.

When the reference snapshot is mounted (/root/reference), import its pure
host-side modules directly (stubbing the native deps they import but don't
need for these functions) and drive both implementations with the same
randomized inputs. This is the strongest parity evidence available without
model weights: identical outputs on thousands of generated cases.
"""

import importlib.util
import json
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "dots_ocr")),
    reason="reference snapshot not mounted",
)


@pytest.fixture(scope="module")
def ref_modules():
    """Import reference modules with fitz/requests stubbed out."""
    # The reference's image_utils imports fitz (PyMuPDF) at module level but
    # smart_resize & friends never touch it.
    saved_modules = dict(sys.modules)
    saved_path = list(sys.path)
    if "fitz" not in sys.modules:
        sys.modules["fitz"] = types.ModuleType("fitz")
    if importlib.util.find_spec("openai") is None:
        openai_stub = types.ModuleType("openai")
        openai_stub.OpenAI = object
        sys.modules["openai"] = openai_stub
    if importlib.util.find_spec("tqdm") is None:
        tqdm_stub = types.ModuleType("tqdm")
        tqdm_stub.tqdm = lambda x, **kw: x
        sys.modules["tqdm"] = tqdm_stub
    sys.path.insert(0, REFERENCE)
    # Ensure we load the REFERENCE package, not anything cached.
    for name in list(sys.modules):
        if name == "dots_ocr" or name.startswith("dots_ocr."):
            del sys.modules[name]
    try:
        import dots_ocr.utils.image_utils as ref_image_utils
        import dots_ocr.utils.output_cleaner as ref_output_cleaner
        import dots_ocr.utils.format_transformer as ref_format_transformer
        import dots_ocr.utils.layout_utils as ref_layout_utils
        import dots_ocr.utils.prompts as ref_prompts

        yield {
            "image_utils": ref_image_utils,
            "output_cleaner": ref_output_cleaner,
            "format_transformer": ref_format_transformer,
            "layout_utils": ref_layout_utils,
            "prompts": ref_prompts,
        }
    finally:
        sys.path[:] = saved_path
        for name in list(sys.modules):
            if name not in saved_modules:
                del sys.modules[name]
        sys.modules.update(saved_modules)


def test_smart_resize_exhaustive(ref_modules):
    from dots_ocr_tpu.utils.resize import smart_resize

    ref = ref_modules["image_utils"].smart_resize
    rng = np.random.RandomState(0)
    cases = 0
    for _ in range(3000):
        h = int(rng.randint(1, 12000))
        w = int(rng.randint(1, 12000))
        if max(h, w) / min(h, w) > 200:
            continue
        assert smart_resize(h, w) == ref(h, w), (h, w)
        cases += 1
    # custom bounds
    for _ in range(500):
        h = int(rng.randint(28, 6000))
        w = int(rng.randint(28, 6000))
        if max(h, w) / min(h, w) > 200:
            continue
        lo = int(rng.randint(3136, 100000))
        hi = int(rng.randint(200000, 11289600))
        assert smart_resize(h, w, min_pixels=lo, max_pixels=hi) == ref(
            h, w, min_pixels=lo, max_pixels=hi
        )
        cases += 1
    assert cases > 2500


def test_prompts_verbatim(ref_modules):
    from dots_ocr_tpu.utils.prompts import dict_promptmode_to_prompt

    ref = ref_modules["prompts"].dict_promptmode_to_prompt
    assert set(dict_promptmode_to_prompt) == set(ref)
    for mode, text in ref.items():
        assert dict_promptmode_to_prompt[mode] == text, mode


def _random_broken_outputs(rng, n):
    """Generate a zoo of malformed model outputs."""
    cats = ["Text", "Title", "Table", "Formula", "Picture"]
    outs = []
    for _ in range(n):
        cells = []
        for _ in range(rng.randint(1, 8)):
            bbox = [int(x) for x in rng.randint(0, 999, rng.choice([3, 4, 4, 4]))]
            cell = {"bbox": bbox, "category": str(rng.choice(cats))}
            if rng.rand() < 0.8:
                cell["text"] = "txt" + str(rng.randint(0, 10))
            cells.append(cell)
        # duplicate some cells to simulate loops
        if rng.rand() < 0.5:
            cells = cells + [cells[0]] * rng.randint(1, 7)
        s = json.dumps(cells)
        roll = rng.rand()
        if roll < 0.3:
            s = s[: rng.randint(10, max(11, len(s)))]  # truncate
        elif roll < 0.5:
            s = s.replace("}, {", "} {", 1)  # drop a delimiter
        elif roll < 0.6:
            s = s.rstrip("]")  # unterminated
        outs.append(s)
    outs += [
        "garbage no json",
        '[{"bbox": [1, 2, 3, 4], "category": "Text", "text": "cut off her',
        "",
    ]
    return outs


def test_output_cleaner_differential(ref_modules):
    from dots_ocr_tpu.utils.repair import OutputCleaner

    RefCleaner = ref_modules["output_cleaner"].OutputCleaner
    rng = np.random.RandomState(1)
    import contextlib, io

    for s in _random_broken_outputs(rng, 300):
        ours = OutputCleaner().clean_model_output(s)
        with contextlib.redirect_stdout(io.StringIO()):  # ref prints a lot
            theirs = RefCleaner().clean_model_output(s)
        assert ours == theirs, f"salvage mismatch on: {s[:120]!r}"


def test_output_cleaner_list_differential(ref_modules):
    from dots_ocr_tpu.utils.repair import OutputCleaner

    RefCleaner = ref_modules["output_cleaner"].OutputCleaner
    import contextlib, io

    cases = [
        [{"bbox": [1, 2, 3], "category": "Text", "text": "keep"}],
        [{"bbox": [1, 2, 3, 4], "category": "Text", "text": "a"}] * 6,
        [{"category": "Text"}, "junk", {"bbox": "bad"}],
        [{"bbox": [5, 6, 7, 8]}, {"bbox": [5, 6, 7, 8], "category": "T"}],
    ]
    for case in cases:
        ours = OutputCleaner().clean_model_output(case)
        with contextlib.redirect_stdout(io.StringIO()):
            theirs = RefCleaner().clean_model_output(case)
        assert ours == theirs, case


def test_formula_markdown_differential(ref_modules):
    from dots_ocr_tpu.utils.markdown import clean_text, get_formula_in_markdown

    ref = ref_modules["format_transformer"]
    cases = [
        "$$E=mc^2$$", "$$a$b$$", "\\[x+y\\]", "see \\[x\\] inline",
        "where $x$ is", "plain text", "\\frac{a}{b}", "\\alpha + \\beta",
        "\\usepackage{amsmath}\\frac{a}{b}", "`\\frac{1}{2}`",
        "  $$\n x \n$$  ", "\\begin{align}x\\end{align}",
    ]
    for s in cases:
        assert get_formula_in_markdown(s) == ref.get_formula_in_markdown(s), s
    for s in ["  hi  ", "`$x$`", "", "a  b"]:
        assert clean_text(s) == ref.clean_text(s), repr(s)


def test_bbox_math_differential(ref_modules):
    """pre/post bbox transforms bit-match the reference (needs PIL only)."""
    from PIL import Image

    from dots_ocr_tpu.utils.boxes import post_process_cells, pre_process_bboxes

    ref = ref_modules["layout_utils"]
    rng = np.random.RandomState(2)
    for _ in range(100):
        ow, oh = int(rng.randint(100, 4000)), int(rng.randint(100, 4000))
        if max(ow, oh) / min(ow, oh) > 50:
            continue
        origin = Image.new("RGB", (ow, oh))
        iw, ih = int(rng.randint(56, 3000)), int(rng.randint(56, 3000))
        if max(iw, ih) / min(iw, ih) > 50:
            continue
        bboxes = [
            [float(rng.randint(0, iw)), float(rng.randint(0, ih)),
             float(rng.randint(0, iw)), float(rng.randint(0, ih))]
            for _ in range(4)
        ]
        ours = pre_process_bboxes(origin, [list(b) for b in bboxes], iw, ih)
        theirs = ref.pre_process_bboxes(origin, [list(b) for b in bboxes], iw, ih)
        assert ours == theirs

        cells = [{"bbox": b, "category": "Text"} for b in bboxes]
        ours_c = post_process_cells(origin, [dict(c) for c in cells], iw, ih)
        theirs_c = ref.post_process_cells(origin, [dict(c) for c in cells], iw, ih)
        assert ours_c == theirs_c


def test_layoutjson2md_differential(ref_modules):
    from PIL import Image

    from dots_ocr_tpu.utils.markdown import layoutjson2md

    ref = ref_modules["format_transformer"]
    img = Image.new("RGB", (200, 200), (123, 222, 101))
    cells = [
        {"bbox": [0, 0, 50, 20], "category": "Title", "text": "# T"},
        {"bbox": [0, 20, 50, 40], "category": "Page-header", "text": "hdr"},
        {"bbox": [10, 50, 90, 120], "category": "Picture"},
        {"bbox": [0, 130, 99, 150], "category": "Formula", "text": "\\frac{1}{2}"},
        {"bbox": [0, 160, 99, 180], "category": "Text", "text": " body "},
        {"bbox": [0, 180, 99, 199], "category": "Page-footer", "text": "ftr"},
    ]
    for nohf in (False, True):
        ours = layoutjson2md(img, [dict(c) for c in cells], no_page_hf=nohf)
        theirs = ref.layoutjson2md(img, [dict(c) for c in cells], no_page_hf=nohf)
        assert ours == theirs, f"no_page_hf={nohf}"
