"""Draw-a-box grounded OCR UI (reference ``demo/demo_gradio_annotion.py``).

Full reference surface (:199-356): draw ONE box -> grounded OCR on that
region; draw NO box -> full-page parse with the selected prompt mode. With
result panes (layout image / markdown render / raw output), test-image
picker, prompt display, clear-all, and numeric bbox fallback when
gradio_image_annotation is unavailable. Logic lives in
``dots_ocr_tpu.ui.callbacks`` (headless-tested); this file is wiring.
"""

from __future__ import annotations

import glob
import os

try:
    import gradio as gr
except ImportError as e:  # pragma: no cover - UI-only dependency
    raise SystemExit("demo_gradio_annotation requires `pip install gradio`") from e

try:
    from gradio_image_annotation import image_annotator

    HAS_ANNOTATOR = True
except ImportError:
    HAS_ANNOTATOR = False

from dots_ocr_tpu.ui.callbacks import (
    annotation_to_bbox,
    parse_annotation_flow,
)
from dots_ocr_tpu.utils.prompts import dict_promptmode_to_prompt

TEST_IMAGES = sorted(glob.glob(os.path.join("demo", "assets", "*.jpg"))) + sorted(
    glob.glob(os.path.join("demo", "assets", "*.png"))
)


def _numeric_annotation(x1, y1, x2, y2):
    """Fallback payload when the annotator component is absent."""
    if (x1, y1, x2, y2) == (0, 0, 0, 0):
        return None  # no box = full-page parse
    return {"boxes": [{"xmin": x1, "ymin": y1, "xmax": x2, "ymax": y2}]}


def build_app() -> "gr.Blocks":
    with gr.Blocks(title="dots.ocr grounded OCR") as app:
        gr.Markdown(
            "# Grounded OCR — draw ONE box to extract its text, "
            "or leave empty for a full-page parse"
        )
        with gr.Row():
            with gr.Column(scale=1):
                image_path = gr.File(label="Image", type="filepath")
                if TEST_IMAGES:
                    test_pick = gr.Dropdown(
                        [""] + TEST_IMAGES, label="...or a test image", value=""
                    )
                if HAS_ANNOTATOR:
                    annot = image_annotator(
                        label="Draw ONE box", single_box=True, show_label=True
                    )
                with gr.Row():
                    x1 = gr.Number(value=0, label="x1")
                    y1 = gr.Number(value=0, label="y1")
                    x2 = gr.Number(value=0, label="x2")
                    y2 = gr.Number(value=0, label="y2")
                prompt_mode = gr.Dropdown(
                    list(dict_promptmode_to_prompt),
                    value="prompt_layout_all_en",
                    label="Prompt mode (no-box parse)",
                )
                prompt_display = gr.Textbox(
                    value=dict_promptmode_to_prompt["prompt_layout_all_en"],
                    label="Current prompt",
                    interactive=False,
                    lines=3,
                )
                with gr.Row():
                    ip = gr.Textbox(value="localhost", label="Server IP")
                    port = gr.Number(value=8000, label="Port")
                with gr.Row():
                    go = gr.Button("🚀 Extract / Parse", variant="primary")
                    clear = gr.Button("🗑️ Clear")
            with gr.Column(scale=2):
                status = gr.Textbox(label="Status", interactive=False)
                layout_img = gr.Image(label="Layout (full-page parse)")
                md_out = gr.Markdown(label="Result")
                raw_out = gr.Textbox(label="Raw output", lines=8)

        prompt_mode.change(
            lambda m: dict_promptmode_to_prompt[m], prompt_mode, prompt_display
        )
        if TEST_IMAGES:
            test_pick.change(lambda p: p or None, test_pick, image_path)

        if HAS_ANNOTATOR:

            def on_annotate(annotation):
                bbox = annotation_to_bbox(annotation) or [0, 0, 0, 0]
                return bbox[0], bbox[1], bbox[2], bbox[3]

            annot.change(on_annotate, annot, [x1, y1, x2, y2])

        def run(path, bx1, by1, bx2, by2, mode, server_ip, server_port):
            annotation = _numeric_annotation(
                int(bx1 or 0), int(by1 or 0), int(bx2 or 0), int(by2 or 0)
            )
            image, md, raw, state = parse_annotation_flow(
                path, annotation, mode, server_ip, server_port
            )
            return image, md, raw, state

        go.click(
            run,
            [image_path, x1, y1, x2, y2, prompt_mode, ip, port],
            [layout_img, md_out, raw_out, status],
        )
        clear.click(
            lambda: (None, 0, 0, 0, 0, None, "", "", ""),
            None,
            [image_path, x1, y1, x2, y2, layout_img, md_out, raw_out, status],
        )
    return app


if __name__ == "__main__":
    build_app().launch(server_name="0.0.0.0")
