"""Interactive single-document UI (reference ``demo/demo_gradio.py`` analog).

Upload an image or PDF, pick a prompt mode, parse against a server, and
inspect the layout overlay / markdown / raw JSON side by side, with per-page
navigation for PDFs and a zip download of all artifacts.

Per-prompt policy tables mirror the reference (``demo_gradio.py:58-82``):
temperature 0.1 everywhere except SVG (0.9), fitz 200-dpi re-raster for
document prompts only.

Requires gradio (`pip install gradio`); the heavy lifting lives in the
library, this file is UI wiring only.
"""

from __future__ import annotations

import json
import os
import tempfile
import zipfile

try:
    import gradio as gr
except ImportError as e:  # pragma: no cover - UI-only dependency
    raise SystemExit("demo_gradio requires `pip install gradio`") from e

from dots_ocr_tpu.ingest.pdf import load_images_from_pdf
from dots_ocr_tpu.parser import DotsOCRParser
from dots_ocr_tpu.utils.prompts import (
    PROMPT_FITZ_PREPROCESS,
    PROMPT_TEMPERATURE,
    dict_promptmode_to_prompt,
)

DEFAULT_SERVER = {"ip": "localhost", "port": 8000}

# Multi-server registry + per-prompt model routing (reference
# demo_gradio.py:42-53 and :80-82 — the SVG task runs a dedicated
# fine-tune, e.g. dots.mocr-svg, often on a separate server).
MODEL_SERVERS = {
    "default": {"ip": "localhost", "port": 8000, "model_name": "model"},
    "svg": {"ip": "localhost", "port": 8001, "model_name": "model-svg"},
}
PROMPT_TO_MODEL = {
    "prompt_image_to_svg": "svg",
}

_parser_cache = {}


def server_for_prompt(prompt_mode: str) -> dict:
    key = PROMPT_TO_MODEL.get(prompt_mode, "default")
    return MODEL_SERVERS.get(key, MODEL_SERVERS["default"])


def get_parser(ip: str, port: int, min_pixels, max_pixels) -> DotsOCRParser:
    key = (ip, port, min_pixels, max_pixels)
    if key not in _parser_cache:
        _parser_cache[key] = DotsOCRParser(
            ip=ip, port=int(port),
            min_pixels=int(min_pixels) if min_pixels else None,
            max_pixels=int(max_pixels) if max_pixels else None,
        )
    return _parser_cache[key]


def parse_document(file_path, prompt_mode, custom_prompt, ip, port,
                   min_pixels, max_pixels):
    if not file_path:
        return None, "upload a file first", "", None, gr.update()
    parser = get_parser(ip, port, min_pixels, max_pixels)
    temperature = PROMPT_TEMPERATURE.get(prompt_mode, 0.1)
    fitz = PROMPT_FITZ_PREPROCESS.get(prompt_mode, False)
    out_dir = tempfile.mkdtemp(prefix="dots_gradio_")
    results = parser.parse_file(
        file_path,
        output_dir=out_dir,
        prompt_mode=prompt_mode,
        fitz_preprocess=fitz,
        custom_prompt=custom_prompt or None,
        temperature=temperature,
    )
    pages = []
    for rec in results:
        md = ""
        if rec.get("md_content_path") and os.path.exists(rec["md_content_path"]):
            md = open(rec["md_content_path"], encoding="utf-8").read()
        cells = None
        if rec.get("layout_info_path") and os.path.exists(rec["layout_info_path"]):
            cells = json.load(open(rec["layout_info_path"], encoding="utf-8"))
        pages.append(
            {"image": rec.get("layout_image_path"), "md": md,
             "json": json.dumps(cells, ensure_ascii=False, indent=2) if cells else ""}
        )

    zip_path = os.path.join(out_dir, "artifacts.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for rec in results:
            for key in ("layout_info_path", "layout_image_path",
                        "md_content_path", "md_content_nohf_path"):
                p = rec.get(key)
                if p and os.path.exists(p):
                    zf.write(p, os.path.basename(p))

    first = pages[0] if pages else {"image": None, "md": "", "json": ""}
    slider = gr.update(minimum=1, maximum=max(1, len(pages)), value=1,
                       visible=len(pages) > 1)
    return first["image"], first["md"], first["json"], zip_path, slider, pages


def show_page(page_no, pages):
    if not pages:
        return None, "", ""
    page = pages[int(page_no) - 1]
    return page["image"], page["md"], page["json"]


def pdf_preview(file_path):
    if not file_path or not file_path.lower().endswith(".pdf"):
        return None
    images = load_images_from_pdf(file_path, dpi=72)
    return images[0] if images else None


def build_app() -> "gr.Blocks":
    with gr.Blocks(title="dots.ocr (TPU)") as app:
        gr.Markdown("# dots.ocr — TPU-native document parser")
        pages_state = gr.State([])
        with gr.Row():
            with gr.Column(scale=1):
                file_input = gr.File(label="Image or PDF", type="filepath")
                prompt_mode = gr.Dropdown(
                    list(dict_promptmode_to_prompt), value="prompt_layout_all_en",
                    label="Prompt mode",
                )
                custom_prompt = gr.Textbox(label="Custom prompt (optional)", lines=2)
                with gr.Accordion("Server & resolution", open=False):
                    ip = gr.Textbox(value=DEFAULT_SERVER["ip"], label="Server IP")
                    port = gr.Number(value=DEFAULT_SERVER["port"], label="Port")
                    min_pixels = gr.Number(value=None, label="min_pixels")
                    max_pixels = gr.Number(value=None, label="max_pixels")
                parse_btn = gr.Button("Parse", variant="primary")
                page_slider = gr.Slider(1, 1, step=1, label="Page", visible=False)
                download = gr.File(label="Download artifacts")
            with gr.Column(scale=2):
                with gr.Tab("Layout"):
                    layout_img = gr.Image(label="Layout", type="filepath")
                with gr.Tab("Markdown"):
                    md_out = gr.Markdown()
                with gr.Tab("JSON"):
                    json_out = gr.Code(language="json")

        parse_btn.click(
            parse_document,
            [file_input, prompt_mode, custom_prompt, ip, port, min_pixels, max_pixels],
            [layout_img, md_out, json_out, download, page_slider, pages_state],
        )
        page_slider.change(
            show_page, [page_slider, pages_state], [layout_img, md_out, json_out]
        )
    return app


if __name__ == "__main__":
    build_app().launch(server_name="0.0.0.0")
