"""Weights-day drill: one command from "checkpoint URL" to "verified
serving config" (VERDICT r2 item 9).

The reference framework's model contract lives entirely in the downloaded
HF checkpoint (`/root/reference/dots_ocr/parser.py:62-76`,
`/root/reference/tools/download_model.py:13-22`). This rebuild was built
against that spec without the weights, so the day they land the open
verification items must close in ORDER — each stage gates the next:

    python tools/weights_day.py --weights ./weights/DotsOCR [--download]

  1. download   (--download) fetch via tools/download_model.py
  2. load       config.json parse + full tensor mapping (loader)
  3. parity     tools/parity_vs_hf.py — tokenizer/decoder/vision activation
                diffs vs transformers (the harness CI already validates the
                decoder math against a real Qwen2; this run checks the REAL
                tensors)
  4. windowed   docs/windowed_vision.md checklist steps 1-2 (config keys /
                processor hints), automated: reports whether windowed
                attention is checkpoint-sanctioned or must stay off
  5. specials   true special-token ids from tokenizer_config/added_tokens
                vs utils/consts expectations
  6. warmup     engine warmup on the real config (catches shape/dtype
                surprises before serving)
  7. sample     one real page parse (demo asset) with structural checks:
                valid layout JSON, categories from the known set, bboxes in
                bounds, reading order sane

Each stage prints PASS/FAIL/SKIP + a remediation hint; exit 0 iff nothing
FAILed. Designed so checkpoint-day is an hour, not a week.

`--smoke` runs the orchestration end-to-end on the tiny random-weight
config (no weights, no network) — CI uses it to keep this script alive.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RESULTS = []


def stage(name):
    def deco(fn):
        def run(ctx):
            t0 = time.time()
            try:
                status, msg = fn(ctx)
            except Exception as e:  # noqa: BLE001
                status, msg = "FAIL", f"{type(e).__name__}: {e}"
                traceback.print_exc()
            RESULTS.append((name, status, msg, time.time() - t0))
            print(f"[{status}] {name}: {msg} ({time.time() - t0:.1f}s)")
            return status
        run.stage_name = name
        return run
    return deco


@stage("download")
def st_download(ctx):
    if not ctx.args.download:
        if os.path.isdir(ctx.args.weights):
            return "SKIP", "weights dir exists; pass --download to refetch"
        return "FAIL", f"{ctx.args.weights} missing and --download not given"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "download_model.py"),
         "--dest", ctx.args.weights],
        capture_output=True, text=True, timeout=3600 * 4,
    )
    if r.returncode != 0:
        return "FAIL", f"download_model.py: {r.stderr[-400:]}"
    return "PASS", f"downloaded to {ctx.args.weights}"


@stage("load")
def st_load(ctx):
    from dots_ocr_tpu.models.loader import load_checkpoint

    config, params = load_checkpoint(ctx.args.weights)
    ctx.config, ctx.params = config, params
    n = sum(x.size for x in __import__("jax").tree.leaves(params))
    return "PASS", (
        f"{n/1e9:.2f}B params; decoder {config.decoder.num_layers}L "
        f"{config.decoder.num_heads}/{config.decoder.num_kv_heads} heads; "
        f"vision {config.vision.num_layers}L window={config.vision.window_size}"
    )


@stage("parity")
def st_parity(ctx):
    report = os.path.join(ctx.args.out_dir, "parity.json")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parity_vs_hf.py"),
         ctx.args.weights, "--report", report],
        capture_output=True, text=True, timeout=3600,
    )
    tail = (r.stdout + r.stderr)[-500:]
    if r.returncode != 0:
        return "FAIL", f"parity_vs_hf failed — see {report}; {tail}"
    return "PASS", f"report at {report}"


@stage("windowed")
def st_windowed(ctx):
    cfg_path = os.path.join(ctx.args.weights, "config.json")
    raw = json.load(open(cfg_path)) if os.path.exists(cfg_path) else {}
    vc = raw.get("vision_config", {})
    keys = {k: vc[k] for k in ("window_size", "fullatt_block_indexes")
            if k in vc}
    if keys:
        return "PASS", (
            f"checkpoint declares {keys} — windowed attention is "
            "training-sanctioned; loader auto-detects (docs/"
            "windowed_vision.md step 1 satisfied; still run step 3)"
        )
    return "SKIP", (
        "config.json declares no window keys: keep --vision-attn full for "
        "eval-quality runs until the docs/windowed_vision.md step-4 "
        "experiment quantifies the windowed approximation"
    )


@stage("specials")
def st_specials(ctx):
    from dots_ocr_tpu.engine.tokenizer import load_tokenizer

    tok = load_tokenizer(ctx.args.weights)
    sp = ctx.config.special
    checks = {}
    for name, text in (
        ("img_id", "<|img|>"),
        ("imgpad_id", "<|imgpad|>"),
        ("endofimg_id", "<|endofimg|>"),
        ("eos_token_id", "<|endoftext|>"),
    ):
        want = getattr(sp, name)
        ids = tok.encode(text)
        got = ids[0] if len(ids) == 1 else None
        checks[name] = (want, got)
    bad = {k: v for k, v in checks.items() if v[0] != v[1]}
    if bad:
        return "FAIL", (
            f"special-token mismatches (config vs tokenizer): {bad} — "
            "update models/config.py SpecialTokens from the checkpoint"
        )
    return "PASS", f"all special ids match: { {k: v[0] for k, v in checks.items()} }"


@stage("warmup")
def st_warmup(ctx):
    from dots_ocr_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        SchedulerConfig,
    )

    eng = ContinuousBatchingEngine(
        ctx.params, ctx.config,
        tokenizer=getattr(ctx, "tokenizer", None),
        sched=SchedulerConfig(**ctx.sched_kw),
    )
    import numpy as np
    from PIL import Image

    dummy = Image.fromarray(np.zeros((560, 420, 3), np.uint8))
    eng.generate_batch(["warmup", "warmup"], [[dummy], []],
                       temperature=0.0, max_new_tokens=4)
    n = eng.warmup_decode()
    ctx.engine = eng
    return "PASS", f"{n} decode programs compiled"


@stage("sample")
def st_sample(ctx):
    import numpy as np
    from PIL import Image

    from dots_ocr_tpu.utils.prompts import dict_promptmode_to_prompt
    from dots_ocr_tpu.utils.repair import clean_string_data

    asset = os.path.join(REPO, "demo", "assets", "sample_page.png")
    if os.path.exists(asset):
        img = Image.open(asset)
    else:
        rng = np.random.RandomState(0)
        img = Image.fromarray(rng.randint(0, 255, (560, 420, 3), np.uint8))
    prompt = dict_promptmode_to_prompt["prompt_layout_all_en"]
    text = ctx.engine.generate_one(
        prompt, images=[img], temperature=0.0,
        max_new_tokens=64 if ctx.args.smoke else 4096,
    )
    if ctx.args.smoke:
        return "PASS", f"tiny-model sample decoded {len(text)} chars"
    cells = clean_string_data(text).data
    if not isinstance(cells, list) or not cells:
        return "FAIL", (
            f"sample parse produced no layout cells (head: {text[:160]!r})"
        )
    known = {"Caption", "Footnote", "Formula", "List-item", "Page-footer",
             "Page-header", "Picture", "Section-header", "Table", "Text",
             "Title"}
    bad_cat = [c.get("category") for c in cells
               if c.get("category") not in known]
    w, h = img.size
    bad_box = [c["bbox"] for c in cells
               if not (0 <= c["bbox"][0] <= c["bbox"][2] <= w
                       and 0 <= c["bbox"][1] <= c["bbox"][3] <= h)]
    if bad_cat or bad_box:
        return "FAIL", f"bad categories {bad_cat[:3]} / bboxes {bad_box[:3]}"
    return "PASS", f"{len(cells)} layout cells, categories + bboxes valid"


class Ctx:
    pass


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--weights", default="./weights/DotsOCR")
    ap.add_argument("--download", action="store_true")
    ap.add_argument("--out-dir", default="./weights_day_out")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny random-weight end-to-end orchestration test")
    args = ap.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    ctx = Ctx()
    ctx.args = args
    ctx.sched_kw = dict(num_pages=512, page_size=128, max_slots=8,
                        prefill_chunk_tokens=2048, speculate_k=3)

    if args.smoke:
        import jax

        from dots_ocr_tpu.models.config import DotsOCRConfig
        from dots_ocr_tpu.models.init import init_params

        ctx.config = DotsOCRConfig.tiny()
        ctx.params = init_params(jax.random.PRNGKey(0), ctx.config)
        ctx.sched_kw = dict(num_pages=64, page_size=8, max_slots=4,
                            max_pages_per_seq=32, prompt_bucket_step=32,
                            vision_bucket_step=16, prefill_chunk_tokens=16)
        stages = [st_warmup, st_sample]
    else:
        stages = [st_download, st_load, st_parity, st_windowed,
                  st_specials, st_warmup, st_sample]

    for st in stages:
        status = st(ctx)
        if status == "FAIL" and st.stage_name in ("download", "load"):
            break  # nothing downstream can run

    print("\n=== weights-day summary ===")
    failed = 0
    for name, status, msg, dt in RESULTS:
        print(f"  {status:4s} {name:10s} {dt:7.1f}s  {msg[:100]}")
        failed += status == "FAIL"
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
