"""Batch processing console (reference ``demo/demo_gradio_batch.py``).

All job semantics — queue, worker pool, transient-error auto-retry with
exponential backoff, failure classification, re-parse, delete, zip exports,
and the sandboxed user-script export engine — live in the library
(``dots_ocr_tpu.batch``); this file is the gradio front end: submit files,
watch live pending/running/done/error counts on a 1 Hz timer, inspect and
export results, run user scripts.
"""

from __future__ import annotations

import json
import os

try:
    import gradio as gr
except ImportError as e:  # pragma: no cover - UI-only dependency
    raise SystemExit("demo_gradio_batch requires `pip install gradio`") from e

from dots_ocr_tpu.batch.jobs import BatchJobManager
from dots_ocr_tpu.batch.script_engine import run_user_script
from dots_ocr_tpu.parser import DotsOCRParser
from dots_ocr_tpu.ui.callbacks import load_result_content, save_result_edits

SERVER = {"ip": "localhost", "port": 8000}
MANAGER = BatchJobManager(
    parser_factory=lambda: DotsOCRParser(ip=SERVER["ip"], port=SERVER["port"]),
    output_dir="./batch_output",
    manifest_path="./batch_output/jobs.jsonl",
    max_concurrency=6,
)
MANAGER.start()

DEFAULT_SCRIPT = """\
# Build a custom export: api reads results, export writes files.
for rid in api.get_ids():
    status = api.get_status(rid)
    if status["status"] != "done":
        continue
    export.add_text(rid + "/result.md", api.get_markdown(rid, nohf=True))
print("exported", len(api.get_ids()), "results")
"""


def submit_files(files, prompt_mode, fitz):
    if not files:
        return "no files selected"
    rids = [
        MANAGER.submit(f, prompt_mode=prompt_mode, fitz_preprocess=bool(fitz))
        for f in files
    ]
    return f"queued {len(rids)} tasks: {', '.join(rids)}"


def progress_table():
    counts = MANAGER.progress()
    rows = [
        [r.rid, os.path.basename(r.input_path), r.status,
         r.retry_attempts, (r.error or "")[:120]]
        for r in sorted(MANAGER.results(), key=lambda r: r.submitted_at)
    ]
    header = (
        f"pending {counts['pending']} | running {counts['running']} | "
        f"done {counts['done']} | error {counts['error']}"
    )
    return header, rows


def view_result(rid):
    r = MANAGER.result((rid or "").strip())
    if r is None:
        return "unknown rid", "", None
    md = ""
    for page in r.artifacts.get("pages", []):
        p = page.get("md_content_path")
        if p and os.path.exists(p):
            md += open(p, encoding="utf-8").read() + "\n\n"
    info = json.dumps(
        {"status": r.status, "retries": r.retry_attempts, "error": r.error},
        ensure_ascii=False, indent=2,
    )
    return info, md, r.export_path


def reparse(rid):
    return f"requeued {MANAGER.reparse((rid or '').strip())}"


def delete(rid):
    MANAGER.delete((rid or "").strip())
    return f"deleted {rid}"


def set_concurrency(n):
    MANAGER.set_max_concurrency(int(n))
    return f"worker pool resized to {int(n)}"


def export_all():
    return MANAGER.export_all_zip()


def run_script(code):
    zip_path, logs = run_user_script(code, MANAGER)
    return logs, zip_path


def build_app() -> "gr.Blocks":
    with gr.Blocks(title="dots.ocr batch console") as app:
        gr.Markdown("# Batch console — queue, retry, export")
        with gr.Tab("Submit"):
            files = gr.File(label="Images / PDFs", file_count="multiple",
                            type="filepath")
            prompt_mode = gr.Dropdown(
                ["prompt_layout_all_en", "prompt_layout_only_en", "prompt_ocr"],
                value="prompt_layout_all_en", label="Prompt mode",
            )
            fitz = gr.Checkbox(value=True, label="fitz preprocess (200 dpi)")
            submit_btn = gr.Button("Queue files", variant="primary")
            submit_log = gr.Textbox(label="log")
            submit_btn.click(submit_files, [files, prompt_mode, fitz], submit_log)
            conc = gr.Slider(1, 32, value=6, step=1, label="Max concurrency")
            conc_log = gr.Textbox(label="")
            conc.release(set_concurrency, conc, conc_log)
        with gr.Tab("Progress"):
            header = gr.Textbox(label="counts")
            table = gr.Dataframe(
                headers=["rid", "file", "status", "retries", "error"],
                label="tasks",
            )
            timer = gr.Timer(1.0)
            timer.tick(progress_table, None, [header, table])
        with gr.Tab("Result"):
            rid_box = gr.Textbox(label="rid")
            info = gr.Code(language="json", label="state")
            md_view = gr.Markdown()
            export_file = gr.File(label="export zip")
            gr.Button("View").click(view_result, rid_box, [info, md_view, export_file])
            with gr.Row():
                rp_log = gr.Textbox(label="")
                gr.Button("Re-parse").click(reparse, rid_box, rp_log)
                gr.Button("Delete").click(delete, rid_box, rp_log)
            all_zip = gr.File(label="all results zip")
            gr.Button("Export all").click(export_all, None, all_zip)
        with gr.Tab("Edit"):
            # Per-result markdown/JSON editing with autosave to edited/
            # and edited-aware exports (reference
            # demo_gradio_batch.py:857-927,1921-2031).
            edit_rid = gr.Textbox(label="rid")
            edit_page = gr.Number(value=0, precision=0, label="page")
            edit_status = gr.Textbox(label="status")
            md_edit = gr.Code(language="markdown", label="markdown")
            json_edit = gr.Code(language="json", label="layout JSON")

            def _load(rid, page):
                return load_result_content(MANAGER, (rid or "").strip(),
                                           int(page or 0))

            def _save(rid, page, md_text, json_text):
                return save_result_edits(MANAGER, (rid or "").strip(),
                                         int(page or 0), md_text, json_text)

            gr.Button("Load").click(
                _load, [edit_rid, edit_page], [md_edit, json_edit, edit_status]
            )
            gr.Button("Save (autosaves to edited/)", variant="primary").click(
                _save, [edit_rid, edit_page, md_edit, json_edit], edit_status
            )
            # Autosave on blur as well — same handler.
            md_edit.blur(_save, [edit_rid, edit_page, md_edit, json_edit],
                         edit_status)
            json_edit.blur(_save, [edit_rid, edit_page, md_edit, json_edit],
                           edit_status)
        with gr.Tab("Script export"):
            code = gr.Code(value=DEFAULT_SCRIPT, language="python", label="script")
            logs = gr.Textbox(label="logs", lines=8)
            script_zip = gr.File(label="script export zip")
            gr.Button("Run script", variant="primary").click(
                run_script, code, [logs, script_zip]
            )
    return app


if __name__ == "__main__":
    build_app().launch(server_name="0.0.0.0")
