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
  5. windowed_ab  checklist step 4 automated: greedy parse full vs forced
                windowed, divergence reported (gates VISION_ATTN=windowed)
  6. vision_w8a8  --vision-quantize int8 gate: W8A8 vs bf16 parse delta
  7. quantize_ab  decoder ladder bf16/int8/int4 greedy-token deltas (gates
                deploy/shipping.env QUANTIZE and the int4 opt-in)
  8. specials   true special-token ids from tokenizer_config/added_tokens
                vs utils/consts expectations
  9. warmup     engine warmup on the real config (catches shape/dtype
                surprises before serving)
 10. sample     one real page parse (demo asset) with structural checks:
                valid layout JSON, categories from the known set, bboxes in
                bounds, reading order sane
 11. end2end_scorer  the OmniDocBench protocol scorer runs (--gt scores
                against the official GT json)

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
# `python tools/weights_day.py` puts tools/ (not the repo root) on
# sys.path; the drill must run from a bare checkout with no install.
if REPO not in sys.path:
    sys.path.insert(0, REPO)

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


@stage("windowed_ab")
def st_windowed_ab(ctx):
    """docs/windowed_vision.md checklist step 4, automated: greedy-parse
    the sample page with full vs forced-windowed encoders and report the
    output divergence. Zero divergence => windowed is free; otherwise the
    printed delta is the data for the eval-set decision."""
    import dataclasses

    import numpy as np
    from PIL import Image

    from dots_ocr_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        SchedulerConfig,
    )
    from dots_ocr_tpu.eval.metrics import normalized_edit_distance
    from dots_ocr_tpu.utils.prompts import dict_promptmode_to_prompt

    if ctx.args.smoke:
        win, full_layers = 2, (1,)
    else:
        from dots_ocr_tpu.utils.shipping import shipping_config

        ship = shipping_config()
        win = int(ship.get("VISION_WINDOW", "16"))
        full_layers = tuple(
            int(i) for i in ship.get("VISION_FULL_LAYERS", "").split(",")
            if i.strip()
        )
    full_layers = tuple(
        i for i in full_layers if i < ctx.config.vision.num_layers
    )
    windowed_cfg = ctx.config.replace(
        vision=dataclasses.replace(
            ctx.config.vision, window_size=win, full_attn_layers=full_layers
        )
    )
    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (560, 420, 3), np.uint8))
    prompt = dict_promptmode_to_prompt["prompt_layout_all_en"]
    budget = 32 if ctx.args.smoke else 512
    outs = {}
    for name, cfg in (("full", ctx.config), ("windowed", windowed_cfg)):
        eng = ContinuousBatchingEngine(
            ctx.params, cfg, tokenizer=getattr(ctx, "tokenizer", None),
            sched=SchedulerConfig(**ctx.sched_kw),
        )
        outs[name] = eng.generate_one(
            prompt, images=[img], temperature=0.0, max_new_tokens=budget
        )
        del eng
        import jax

        jax.clear_caches()  # cap host RAM: each A/B arm compiled its own programs
    if not outs["full"] or not outs["windowed"]:
        return "FAIL", "empty parse output (prompt rejected? check sched_kw)"
    dist = normalized_edit_distance(outs["full"], outs["windowed"])
    verdict = "identical" if dist == 0 else f"edit distance {dist:.4f}"
    if ctx.args.smoke or dist < 0.05:
        return "PASS", (
            f"full-vs-windowed greedy outputs {verdict} (step-4 A/B; run "
            "the eval-set version before forcing VISION_ATTN=windowed)"
        )
    return "FAIL", (
        f"windowed encoder diverges ({verdict}) — keep VISION_ATTN=config/"
        "full for eval-quality runs (docs/windowed_vision.md step 4)"
    )


@stage("vision_w8a8")
def st_vision_w8a8(ctx):
    """--vision-quantize int8 gate: W8A8 encoder outputs vs bf16 on a real
    page through the full parse; ship the flag only if outputs agree."""
    import numpy as np
    from PIL import Image

    from dots_ocr_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        SchedulerConfig,
    )
    from dots_ocr_tpu.eval.metrics import normalized_edit_distance
    from dots_ocr_tpu.models.quantize import quantize_vision_params
    from dots_ocr_tpu.utils.prompts import dict_promptmode_to_prompt

    rng = np.random.RandomState(1)
    img = Image.fromarray(rng.randint(0, 255, (560, 420, 3), np.uint8))
    prompt = dict_promptmode_to_prompt["prompt_ocr"]
    budget = 32 if ctx.args.smoke else 512
    outs = {}
    for name, params in (
        ("bf16", ctx.params),
        ("w8a8", quantize_vision_params(ctx.params)),
    ):
        eng = ContinuousBatchingEngine(
            params, ctx.config, tokenizer=getattr(ctx, "tokenizer", None),
            sched=SchedulerConfig(**ctx.sched_kw),
        )
        outs[name] = eng.generate_one(
            prompt, images=[img], temperature=0.0, max_new_tokens=budget
        )
        del eng
        import jax

        jax.clear_caches()  # cap host RAM: each A/B arm compiled its own programs
    if not outs["bf16"] or not outs["w8a8"]:
        return "FAIL", "empty parse output (prompt rejected? check sched_kw)"
    dist = normalized_edit_distance(outs["bf16"], outs["w8a8"])
    if ctx.args.smoke or dist < 0.02:
        return "PASS", (
            f"W8A8 vision output edit distance {dist:.4f} vs bf16 — "
            "--vision-quantize int8 is usable (confirm on an eval set)"
        )
    return "FAIL", (
        f"W8A8 vision diverges (edit distance {dist:.4f}) — keep "
        "--vision-quantize none"
    )


@stage("quantize_ab")
def st_quantize_ab(ctx):
    """Decoder weight-only quantization ladder on the real weights: greedy
    tokens bf16 vs int8 vs int4 on the sample page. int8 is the shipping
    default (deploy/shipping.env QUANTIZE); int4 is the opt-in fast path —
    both must be re-judged the day real weights land."""
    import numpy as np
    from PIL import Image

    from dots_ocr_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        SchedulerConfig,
    )
    from dots_ocr_tpu.eval.metrics import normalized_edit_distance
    from dots_ocr_tpu.models.quantize import (
        quantize_decoder_params,
        quantize_decoder_params_int4,
    )
    from dots_ocr_tpu.utils.prompts import dict_promptmode_to_prompt

    rng = np.random.RandomState(2)
    img = Image.fromarray(rng.randint(0, 255, (560, 420, 3), np.uint8))
    prompt = dict_promptmode_to_prompt["prompt_ocr"]
    budget = 24 if ctx.args.smoke else 512
    outs = {}
    for name, params in (
        ("bf16", ctx.params),
        ("int8", quantize_decoder_params(ctx.params)),
        ("int4", quantize_decoder_params_int4(ctx.params)),
    ):
        eng = ContinuousBatchingEngine(
            params, ctx.config, tokenizer=getattr(ctx, "tokenizer", None),
            sched=SchedulerConfig(**ctx.sched_kw),
        )
        outs[name] = eng.generate_one(
            prompt, images=[img], temperature=0.0, max_new_tokens=budget
        )
        del eng
        import jax

        jax.clear_caches()  # cap host RAM: each A/B arm compiled its own programs
    if not all(outs.values()):
        return "FAIL", "empty parse output (prompt rejected? check sched_kw)"
    d8 = normalized_edit_distance(outs["bf16"], outs["int8"])
    d4 = normalized_edit_distance(outs["bf16"], outs["int4"])
    msg = f"vs bf16: int8 edit {d8:.4f}, int4 edit {d4:.4f}"
    if ctx.args.smoke:
        return "PASS", msg + " (smoke: divergence expected on random weights)"
    if d8 < 0.02:
        return "PASS", msg + (
            " — int8 ships; int4 usable" if d4 < 0.02
            else " — int8 ships; hold int4 pending an eval-set run"
        )
    return "FAIL", msg + " — re-derive QUANTIZE before serving real weights"


@stage("end2end_scorer")
def st_end2end_scorer(ctx):
    """Exercise the OmniDocBench protocol scorer (eval/end2end.py): with
    --gt, score this drill's outputs; otherwise prove the wiring on a
    built-in fixture (VERDICT r4: the scorer must be part of the drill)."""
    from dots_ocr_tpu.eval.end2end import score_pages_end2end

    gt = getattr(ctx.args, "gt", None)
    preds_dir = getattr(ctx.args, "preds", None)
    if gt and os.path.exists(gt):
        samples = json.load(open(gt, encoding="utf-8"))
        if preds_dir and os.path.isdir(preds_dir):
            preds = {}
            for name in os.listdir(preds_dir):
                if name.endswith(".md"):
                    with open(os.path.join(preds_dir, name),
                              encoding="utf-8") as f:
                        preds[os.path.splitext(name)[0]] = f.read()
            note = f"against {gt} with {len(preds)} predictions"
        else:
            # No predictions yet: round-trip the GT through the markdown
            # emitter as the prediction set — the protocol score should be
            # near-perfect, which pins matching+normalization end to end.
            from dots_ocr_tpu.eval.end2end import gt_to_markdown

            preds = {}
            for s in samples:
                stem = os.path.splitext(os.path.basename(
                    (s.get("page_info") or {}).get("image_path", "")))[0]
                if stem:
                    preds[stem] = gt_to_markdown(s)
            note = f"GT round-trip over {gt} (pass --preds DIR for real)"
        # The one-time official cross-run this environment cannot do
        # (PARITY.md round-5 item 10): print the exact command pair.
        print("  cross-check (network day): "
              "python OmniDocBench/tools/pdf_validation.py --gt %s --pred "
              "<dir>  VS  python -m dots_ocr_tpu.eval.end2end --gt %s "
              "--pred <dir> ; diff the 【Overall】 blocks; re-derivation "
              "choices listed in eval/end2end.py docstring" % (gt, gt))
    else:
        samples = [{
            "page_info": {
                "image_path": "fixture_page.jpg",
                "page_attribute": {"language": "english"},
            },
            "layout_dets": [
                {"category_type": "text_block", "text": "hello world",
                 "order": 1},
                {"category_type": "title", "text": "A Title", "order": 0},
            ],
        }]
        preds = {"fixture_page": "# A Title\n\nhello world\n"}
        note = "on the built-in fixture (pass --gt OmniDocBench.json)"
    scores = score_pages_end2end(samples, preds)
    overall = {
        k: v for k, v in scores.items()
        if isinstance(k, str) and k.startswith("overall")
    }
    return "PASS", f"protocol scorer ran {note}: {overall}"


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
    # Smoke caps the bucket warm (the CPU fallback path buckets table
    # widths; warming all of them is a multi-minute CI tax with no
    # orchestration value) — the real drill warms everything.
    n = eng.warmup_decode(max_len=256 if ctx.args.smoke else None)
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
        if not text:
            return "FAIL", "tiny-model sample decoded nothing (rejected?)"
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
    ap.add_argument("--gt", default=None,
                    help="OmniDocBench.json for the end2end_scorer stage")
    ap.add_argument("--preds", default=None,
                    help="dir of per-page predicted .md for the "
                    "end2end_scorer stage (default: GT round-trip)")
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
        # The layout prompt + a 560x420 image is ~1.2k tokens = ~150 pages
        # at page_size 8 — the pool must actually ADMIT it or every image
        # stage passes vacuously on empty outputs (the stages also guard).
        # Must admit the LARGEST smoke prompt: the 840x1188 demo asset is
        # ~1.3k vision + ~0.8k text tokens = ~260 pages at page_size 8.
        ctx.sched_kw = dict(num_pages=768, page_size=8, max_slots=4,
                            max_pages_per_seq=320, prompt_bucket_step=32,
                            vision_bucket_step=16, prefill_chunk_tokens=16)
        stages = [st_warmup, st_sample, st_windowed_ab, st_vision_w8a8,
                  st_quantize_ab, st_end2end_scorer]
    else:
        stages = [st_download, st_load, st_parity, st_windowed,
                  st_windowed_ab, st_vision_w8a8, st_quantize_ab,
                  st_specials, st_warmup, st_sample, st_end2end_scorer]

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
