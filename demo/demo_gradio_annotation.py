"""Draw-a-box grounded OCR UI (reference ``demo/demo_gradio_annotion.py``).

The user draws one bounding box on the image; the box is converted to
``[xmin, ymin, xmax, ymax]`` in original-image coordinates and forces the
``prompt_grounding_ocr`` mode (reference ``:246-251``). Falls back to
numeric bbox inputs when gradio_image_annotation is unavailable.
"""

from __future__ import annotations

import tempfile

try:
    import gradio as gr
except ImportError as e:  # pragma: no cover - UI-only dependency
    raise SystemExit("demo_gradio_annotation requires `pip install gradio`") from e

try:
    from gradio_image_annotation import image_annotator

    HAS_ANNOTATOR = True
except ImportError:
    HAS_ANNOTATOR = False

from dots_ocr_tpu.parser import DotsOCRParser


def parse_with_bbox(image_path, x1, y1, x2, y2, ip, port):
    if not image_path:
        return "upload an image first"
    bbox = [int(x1), int(y1), int(x2), int(y2)]
    if bbox[2] <= bbox[0] or bbox[3] <= bbox[1]:
        return "invalid bbox: x2/y2 must exceed x1/y1"
    parser = DotsOCRParser(ip=ip, port=int(port))
    out_dir = tempfile.mkdtemp(prefix="dots_grounding_")
    results = parser.parse_file(
        image_path, output_dir=out_dir, prompt_mode="prompt_grounding_ocr", bbox=bbox
    )
    rec = results[0]
    md_path = rec.get("md_content_path")
    if md_path:
        with open(md_path, encoding="utf-8") as f:
            return f.read()
    return "(no output)"


def _annotation_to_bbox(annotation) -> list:
    boxes = (annotation or {}).get("boxes") or []
    if not boxes:
        return [0, 0, 0, 0]
    box = boxes[-1]
    return [box["xmin"], box["ymin"], box["xmax"], box["ymax"]]


def build_app() -> "gr.Blocks":
    with gr.Blocks(title="dots.ocr grounded OCR") as app:
        gr.Markdown("# Grounded OCR — extract text from a drawn box")
        with gr.Row():
            with gr.Column():
                if HAS_ANNOTATOR:
                    annot = image_annotator(
                        label="Draw ONE box", single_box=True, show_label=True
                    )
                image_path = gr.File(label="Image", type="filepath")
                with gr.Row():
                    x1 = gr.Number(value=0, label="x1")
                    y1 = gr.Number(value=0, label="y1")
                    x2 = gr.Number(value=100, label="x2")
                    y2 = gr.Number(value=100, label="y2")
                ip = gr.Textbox(value="localhost", label="Server IP")
                port = gr.Number(value=8000, label="Port")
                go = gr.Button("Extract", variant="primary")
            with gr.Column():
                out = gr.Markdown(label="Extracted text")

        if HAS_ANNOTATOR:
            def on_annotate(annotation):
                bbox = _annotation_to_bbox(annotation)
                return bbox[0], bbox[1], bbox[2], bbox[3]

            annot.change(on_annotate, annot, [x1, y1, x2, y2])

        go.click(parse_with_bbox, [image_path, x1, y1, x2, y2, ip, port], out)
    return app


if __name__ == "__main__":
    build_app().launch(server_name="0.0.0.0")
