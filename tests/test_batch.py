"""Batch job system + sandboxed script engine tests."""

import json
import os
import time
import zipfile

import numpy as np
import pytest
from PIL import Image

from dots_ocr_tpu.batch.jobs import (
    BatchJobManager,
    classify_parse_failure,
    is_transient_backend_error,
)
from dots_ocr_tpu.batch.script_engine import ExportBuilder, run_user_script


class FakeParser:
    """Parser stand-in: writes real artifact files like DotsOCRParser."""

    def __init__(self, fail_times=0, fail_message="connection refused", permanent=False):
        self.fail_times = fail_times
        self.fail_message = fail_message
        self.permanent = permanent
        self.calls = 0

    def parse_file(self, input_path, output_dir="", prompt_mode="prompt_layout_all_en", **kw):
        self.calls += 1
        if self.permanent:
            raise RuntimeError(self.fail_message)
        if self.calls <= self.fail_times:
            raise ConnectionError(self.fail_message)
        name = os.path.splitext(os.path.basename(input_path))[0]
        save_dir = os.path.join(output_dir, name)
        os.makedirs(save_dir, exist_ok=True)
        md = os.path.join(save_dir, f"{name}.md")
        with open(md, "w") as f:
            f.write(f"# parsed {name}")
        js = os.path.join(save_dir, f"{name}.json")
        with open(js, "w") as f:
            json.dump([{"bbox": [0, 0, 1, 1], "category": "Text", "text": "x"}], f)
        return [{"page_no": 0, "md_content_path": md, "layout_info_path": js}]


@pytest.fixture
def image_file(tmp_path):
    p = tmp_path / "doc.png"
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(p)
    return str(p)


def test_transient_classifier():
    assert is_transient_backend_error(ConnectionError("Connection refused"))
    assert is_transient_backend_error(TimeoutError("read timeout"))
    assert is_transient_backend_error(RuntimeError("502 Bad Gateway"))
    assert not is_transient_backend_error(ValueError("bad bbox"))


def test_failure_classification_messages():
    msg = classify_parse_failure(RuntimeError("no results returned"), 100, 10**9)
    assert "min_pixels too small" in msg
    assert "max_pixels too large" in msg
    assert "no results" in msg.lower() or "Parser returned no results" in msg
    msg = classify_parse_failure(ValueError("weird"), None, None)
    assert "Unknown error" in msg


def test_submit_and_complete(tmp_path, image_file):
    mgr = BatchJobManager(lambda: FakeParser(), output_dir=str(tmp_path / "out"),
                          max_concurrency=2)
    mgr.start()
    rid = mgr.submit(image_file)
    assert mgr.wait_all(timeout=10)
    r = mgr.result(rid)
    assert r.status == "done"
    assert os.path.exists(r.export_path)
    with zipfile.ZipFile(r.export_path) as zf:
        assert any(n.endswith(".md") for n in zf.namelist())
    mgr.stop()


def test_transient_retry_then_success(tmp_path, image_file):
    parser = FakeParser(fail_times=2)
    mgr = BatchJobManager(lambda: parser, output_dir=str(tmp_path / "out"),
                          max_concurrency=1)
    mgr.start()
    rid = mgr.submit(image_file)
    deadline = time.time() + 20
    while time.time() < deadline:
        r = mgr.result(rid)
        if r and r.status == "done":
            break
        time.sleep(0.1)
    r = mgr.result(rid)
    assert r.status == "done"
    assert r.retry_attempts == 2
    mgr.stop()


def test_permanent_failure_classified(tmp_path, image_file):
    mgr = BatchJobManager(
        lambda: FakeParser(permanent=True, fail_message="cannot identify image file"),
        output_dir=str(tmp_path / "out"), max_concurrency=1,
    )
    mgr.start()
    rid = mgr.submit(image_file)
    assert mgr.wait_all(timeout=10)
    r = mgr.result(rid)
    assert r.status == "error"
    assert "unreadable" in r.error
    mgr.stop()


def test_reparse_and_delete(tmp_path, image_file):
    mgr = BatchJobManager(lambda: FakeParser(), output_dir=str(tmp_path / "out"),
                          max_concurrency=1)
    mgr.start()
    rid = mgr.submit(image_file)
    mgr.wait_all(timeout=10)
    assert mgr.reparse(rid) == rid
    mgr.wait_all(timeout=10)
    assert mgr.result(rid).status == "done"
    mgr.delete(rid)
    assert mgr.result(rid) is None
    mgr.stop()


def test_progress_counts(tmp_path, image_file):
    mgr = BatchJobManager(lambda: FakeParser(), output_dir=str(tmp_path / "out"))
    rid = mgr.submit(image_file)  # workers not started
    p = mgr.progress()
    assert p["pending"] == 1 and p["total"] == 1
    mgr.start()
    mgr.wait_all(timeout=10)
    assert mgr.progress()["done"] == 1
    mgr.stop()


def test_manifest_persistence(tmp_path, image_file):
    manifest = str(tmp_path / "jobs.jsonl")
    mgr = BatchJobManager(lambda: FakeParser(), output_dir=str(tmp_path / "out"),
                          manifest_path=manifest, max_concurrency=1)
    mgr.start()
    rid = mgr.submit(image_file)
    mgr.wait_all(timeout=10)
    # wait=True joins workers so the final manifest write has landed
    mgr.stop(wait=True)
    # A fresh manager restores prior results from the manifest.
    mgr2 = BatchJobManager(lambda: FakeParser(), output_dir=str(tmp_path / "out"),
                           manifest_path=manifest)
    r = mgr2.result(rid)
    assert r is not None and r.status == "done"


def test_export_all_zip(tmp_path, image_file):
    mgr = BatchJobManager(lambda: FakeParser(), output_dir=str(tmp_path / "out"),
                          max_concurrency=1)
    mgr.start()
    mgr.submit(image_file)
    mgr.wait_all(timeout=10)
    dest = mgr.export_all_zip()
    with zipfile.ZipFile(dest) as zf:
        assert len(zf.namelist()) >= 2
    mgr.stop()


# ---------------------------------------------------------------------------
# Script engine
# ---------------------------------------------------------------------------


def _done_manager(tmp_path, image_file):
    mgr = BatchJobManager(lambda: FakeParser(), output_dir=str(tmp_path / "out"),
                          max_concurrency=1)
    mgr.start()
    mgr.submit(image_file)
    mgr.wait_all(timeout=10)
    mgr.stop()
    return mgr


def test_script_basic_export(tmp_path, image_file):
    mgr = _done_manager(tmp_path, image_file)
    script = """
ids = api.get_ids()
print("count", len(ids))
for rid in ids:
    md = api.get_markdown(rid)
    export.add_text(rid + "/combined.md", md)
"""
    zip_path, logs = run_user_script(script, mgr)
    assert "count 1" in logs
    assert zip_path and os.path.exists(zip_path)
    with zipfile.ZipFile(zip_path) as zf:
        assert any(n.endswith("combined.md") for n in zf.namelist())


def test_script_sandbox_blocks_imports(tmp_path, image_file):
    mgr = _done_manager(tmp_path, image_file)
    zip_path, logs = run_user_script("import os", mgr)
    assert zip_path is None
    assert "SCRIPT ERROR" in logs

    zip_path, logs = run_user_script("open('/etc/passwd')", mgr)
    assert "SCRIPT ERROR" in logs


def test_script_error_reported(tmp_path, image_file):
    mgr = _done_manager(tmp_path, image_file)
    zip_path, logs = run_user_script("1/0", mgr)
    assert zip_path is None
    assert "ZeroDivisionError" in logs


def test_export_builder_traversal_blocked():
    eb = ExportBuilder()
    with pytest.raises(ValueError):
        eb.add_text("../../escape.txt", "nope")
