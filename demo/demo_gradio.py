"""Interactive single-document UI (reference ``demo/demo_gradio.py`` analog).

Upload an image or PDF, pick a prompt mode, parse against a server, and
inspect the layout overlay / markdown / raw JSON side by side, with per-page
navigation for PDFs and a zip download of all artifacts.

Per-prompt policy tables mirror the reference (``demo_gradio.py:58-82``):
temperature 0.1 everywhere except SVG (0.9), fitz 200-dpi re-raster for
document prompts only; the multi-server registry routes the SVG prompt to
its dedicated fine-tune server (``demo_gradio.py:42-53,80-82``).

All callback logic lives in ``dots_ocr_tpu.ui.callbacks`` (headless-tested);
this file is gradio wiring only (`pip install gradio`).
"""

from __future__ import annotations

try:
    import gradio as gr
except ImportError as e:  # pragma: no cover - UI-only dependency
    raise SystemExit("demo_gradio requires `pip install gradio`") from e

from dots_ocr_tpu.ui.callbacks import (
    DEFAULT_SERVER,
    MODEL_SERVERS,
    parse_document,
    pdf_preview,
    server_for_prompt,
    show_page,
)
from dots_ocr_tpu.utils.prompts import dict_promptmode_to_prompt


def build_app() -> "gr.Blocks":
    with gr.Blocks(title="dots.ocr (TPU)") as app:
        gr.Markdown("# dots.ocr — TPU-native document parser")
        pages_state = gr.State([])
        with gr.Row():
            with gr.Column(scale=1):
                file_input = gr.File(label="Image or PDF", type="filepath")
                preview = gr.Image(label="PDF preview", visible=True)
                prompt_mode = gr.Dropdown(
                    list(dict_promptmode_to_prompt), value="prompt_layout_all_en",
                    label="Prompt mode",
                )
                custom_prompt = gr.Textbox(label="Custom prompt (optional)", lines=2)
                with gr.Accordion("Server & resolution", open=False):
                    server_choice = gr.Dropdown(
                        list(MODEL_SERVERS), value="default", label="Server",
                    )
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

        def pick_server(name):
            server = MODEL_SERVERS.get(name, DEFAULT_SERVER)
            return server["ip"], server["port"]

        def route_prompt(mode):
            server = server_for_prompt(mode)
            return server["ip"], server["port"]

        server_choice.change(pick_server, [server_choice], [ip, port])
        prompt_mode.change(route_prompt, [prompt_mode], [ip, port])
        file_input.change(pdf_preview, [file_input], [preview])
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
