"""Speculation realism: n-gram draft acceptance on realistic token streams.

VERDICT r3 #6: the acceptance curve (BENCH_SPEC_CURVE_r3.json) measured
COST vs acceptance on-chip, but acceptance itself was only ever exercised
at the zeros-weights full-acceptance ceiling. This tool measures what the
engine's actual drafter (bigram prompt-lookup over generated history,
engine/scheduler.py spec_decode_program) would accept on the workloads
``SPECULATE_K`` ships ON for (k=2 since r5, BENCH_SPEC_CURVE_r5.json):

  * layout JSON  — prompt_layout_all_en output (bbox/category/text cells;
                   the serving default, /root/reference/dots_ocr/utils/prompts.py:3)
  * markdown OCR — prompt_ocr page text
  * HTML tables  — table-heavy pages (TEDS benchmark rows)
  * SVG          — image-to-SVG long decode (prompt_image_to_svg)

For greedy rows the device pipeline is deterministic, so acceptance on a
stream is computable exactly on the host (engine/spec_sim.py — pinned
against the real device program by tests/test_spec_realism.py). The
streams here are synthesized documents (no real checkpoint exists in this
environment) tokenized two ways that bracket the real Qwen2 BPE:

  * bytes — the engine's actual weightless-fallback tokenizer
    (engine/tokenizer.py ByteTokenizer); MORE repetitive than BPE at the
    scaffolding level (optimistic for acceptance),
  * words — regex word/punct pieces with a per-corpus id table; LESS
    repetitive than BPE merges make real streams (pessimistic).

Usage:
  python tools/spec_realism.py [--json OUT.json] [--k 1 2 3 4 5 6]
        [--cost-ratio-k3 1.33]

The cost side comes from the measured on-chip curve (BENCH_SPEC_CURVE_r3:
verify/plain step-cost ratio 1.33 at k=3, 64 slots) — estimated speedup =
emitted_per_iter / cost_ratio. Ratios for other k can be supplied via
--cost-ratios as JSON ({"1": 1.1, ...}) once measured by tools/bench_spec.
"""

from __future__ import annotations

import argparse
import json
import random
import re
import sys
from typing import Dict, List

sys.path.insert(0, ".")  # repo root

from dots_ocr_tpu.engine.spec_sim import simulate_greedy_spec  # noqa: E402

# ---------------------------------------------------------------------------
# Synthetic-but-realistic document content
# ---------------------------------------------------------------------------

_WORDS = (
    "the of and to in a is that for it as was with be by on not he this are "
    "or his from at which but have an had they you were their one all we can "
    "her has there been if more when will would who so no out up into than "
    "them these other then its people over time year some could them see two "
    "way use man day get own say she may part new sound take only little "
    "work know place live me back give most very after thing our just name "
    "good sentence think great where help through much before line right too "
    "mean old any same tell boy follow came want show also around form three "
    "small set put end does another well large must big even such because "
    "turn here why ask went men read need land different home us move try "
    "kind hand picture again change off play spell air away animal house "
    "point page letter mother answer found study still learn should america "
    "world high every near add food between below country plant last school "
    "father keep tree never start city earth eye light thought head under "
    "story saw left dont few while along might close something seem next "
    "hard open example begin life always those both paper together got group "
    "often run important until children side feet car mile night walk white "
    "sea began grow took river four carry state once book hear stop without "
    "second late miss idea enough eat face watch far really almost let above "
    "girl sometimes mountain cut young talk soon list song being leave "
    "family revenue growth quarterly subscription margin operating segment "
    "consolidated fiscal statement disclosure amortization depreciation "
    "liabilities equity derivative hedging valuation impairment goodwill "
    "methodology hypothesis experiment coefficient regression variance "
    "distribution algorithm parameter optimization convergence gradient"
).split()

_CATEGORIES = [
    "Text", "Title", "Section-header", "List-item", "Table", "Formula",
    "Picture", "Caption", "Footnote", "Page-header", "Page-footer",
]

_FORMULAS = [
    r"E = m c^2",
    r"\int_0^\infty e^{-x^2} dx = \frac{\sqrt{\pi}}{2}",
    r"\sum_{i=1}^n x_i^2 \geq \frac{1}{n}\left(\sum_{i=1}^n x_i\right)^2",
    r"\nabla \cdot \mathbf{E} = \frac{\rho}{\varepsilon_0}",
    r"f(x) = \frac{1}{\sigma\sqrt{2\pi}} e^{-\frac{(x-\mu)^2}{2\sigma^2}}",
]


def _sentence(rng: random.Random, n_words: int) -> str:
    # Zipf-ish: low indexes (function words) dominate, like real prose.
    words = []
    for _ in range(n_words):
        idx = min(int(rng.paretovariate(1.1)) - 1, len(_WORDS) - 1)
        words.append(_WORDS[idx])
    s = " ".join(words)
    return s[0].upper() + s[1:] + rng.choice([".", ".", ".", ",", ";"])


def _paragraph(rng: random.Random, n_sentences: int) -> str:
    return " ".join(_sentence(rng, rng.randint(8, 24))
                    for _ in range(n_sentences))


def _html_table(rng: random.Random, rows: int, cols: int) -> str:
    head = "<tr>" + "".join(
        f"<td>{rng.choice(_WORDS).title()}</td>" for _ in range(cols)
    ) + "</tr>"
    body = []
    for _ in range(rows):
        cells = []
        for c in range(cols):
            if c == 0:
                cells.append(rng.choice(_WORDS))
            else:
                cells.append(f"{rng.uniform(0.1, 9999):,.1f}"
                             if rng.random() < 0.8 else str(rng.randint(0, 500)))
        body.append("<tr>" + "".join(f"<td>{c}</td>" for c in cells) + "</tr>")
    return "<table>" + head + "".join(body) + "</table>"


def layout_json_stream(rng: random.Random, n_cells: int = 48) -> str:
    """One page of prompt_layout_all_en output: the serving default."""
    cells = []
    y = 80
    for i in range(n_cells):
        cat = rng.choices(
            _CATEGORIES,
            weights=[40, 2, 8, 12, 4, 3, 4, 5, 3, 1, 1],
        )[0]
        h = rng.randint(28, 180)
        x1 = rng.choice([88, 88, 88, 512])
        bbox = [x1, y, x1 + rng.randint(300, 824), min(y + h, 2020)]
        y = min(y + h + rng.randint(4, 30), 1900)
        cell: Dict[str, object] = {"bbox": bbox, "category": cat}
        if cat == "Picture":
            pass  # pictures omit text (reference prompt contract)
        elif cat == "Table":
            cell["text"] = _html_table(rng, rng.randint(3, 8),
                                       rng.randint(3, 6))
        elif cat == "Formula":
            cell["text"] = rng.choice(_FORMULAS)
        elif cat in ("Title", "Section-header"):
            cell["text"] = _sentence(rng, rng.randint(3, 8)).rstrip(".,;")
        else:
            cell["text"] = _paragraph(rng, rng.randint(1, 4))
        cells.append(cell)
    return json.dumps(cells, ensure_ascii=False)


def markdown_ocr_stream(rng: random.Random, n_blocks: int = 40) -> str:
    out = []
    for _ in range(n_blocks):
        r = rng.random()
        if r < 0.08:
            out.append("# " + _sentence(rng, rng.randint(3, 7)).rstrip(".,;"))
        elif r < 0.2:
            out.append("\n".join(
                f"- {_sentence(rng, rng.randint(5, 14))}"
                for _ in range(rng.randint(2, 6))
            ))
        elif r < 0.26:
            out.append(f"$$\n{rng.choice(_FORMULAS)}\n$$")
        else:
            out.append(_paragraph(rng, rng.randint(2, 5)))
    return "\n\n".join(out)


def html_table_page_stream(rng: random.Random) -> str:
    cells = []
    for _ in range(rng.randint(3, 5)):
        cells.append({
            "bbox": [88, rng.randint(100, 1800), 912, rng.randint(200, 2000)],
            "category": "Table",
            "text": _html_table(rng, rng.randint(8, 20), rng.randint(4, 8)),
        })
    return json.dumps(cells, ensure_ascii=False)


def svg_stream(rng: random.Random, n_paths: int = 60) -> str:
    parts = ['<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 1024 768">']
    for _ in range(n_paths):
        kind = rng.random()
        color = f"#{rng.randint(0, 0xFFFFFF):06x}"
        if kind < 0.5:
            d = f"M {rng.randint(0, 1024)} {rng.randint(0, 768)}"
            for _ in range(rng.randint(2, 8)):
                d += (f" L {rng.randint(0, 1024)} {rng.randint(0, 768)}"
                      if rng.random() < 0.7 else
                      f" C {rng.randint(0, 1024)} {rng.randint(0, 768)},"
                      f" {rng.randint(0, 1024)} {rng.randint(0, 768)},"
                      f" {rng.randint(0, 1024)} {rng.randint(0, 768)}")
            parts.append(f'<path d="{d} Z" fill="{color}"/>')
        elif kind < 0.8:
            parts.append(
                f'<rect x="{rng.randint(0, 900)}" y="{rng.randint(0, 700)}" '
                f'width="{rng.randint(10, 300)}" height="{rng.randint(10, 200)}" '
                f'fill="{color}"/>')
        else:
            parts.append(
                f'<circle cx="{rng.randint(0, 1024)}" cy="{rng.randint(0, 768)}" '
                f'r="{rng.randint(4, 80)}" fill="{color}"/>')
    parts.append("</svg>")
    return "".join(parts)


# ---------------------------------------------------------------------------
# Tokenizations bracketing the real BPE
# ---------------------------------------------------------------------------

_WORD_RE = re.compile(r"[A-Za-z]+|[0-9]|\s+|.", re.DOTALL)


def tokenize_bytes(text: str) -> List[int]:
    """The engine's actual weightless tokenizer (ByteTokenizer ids)."""
    return list(text.encode("utf-8"))


def tokenize_words(text: str) -> List[int]:
    """Word/digit/punct pieces with a corpus-local id table — the
    pessimistic bracket (fewer, more content-bearing tokens than BPE)."""
    table: Dict[str, int] = {}
    out = []
    for m in _WORD_RE.finditer(text):
        piece = m.group(0)
        out.append(table.setdefault(piece, len(table)))
    return out


WORKLOADS = {
    "layout_json": lambda rng: layout_json_stream(rng),
    "markdown_ocr": lambda rng: markdown_ocr_stream(rng),
    "html_tables": lambda rng: html_table_page_stream(rng),
    "svg": lambda rng: svg_stream(rng),
}


def measure(ks: List[int], seed: int = 0, pages: int = 3) -> dict:
    rng = random.Random(seed)
    results: dict = {}
    for name, gen in WORKLOADS.items():
        texts = [gen(rng) for _ in range(pages)]
        results[name] = {}
        for tok_name, tok in (("bytes", tokenize_bytes),
                              ("words", tokenize_words)):
            streams = [tok(t) for t in texts]
            for k in ks:
                sims = [simulate_greedy_spec(s, k) for s in streams]
                tot = sum(r.num_tokens for r in sims)
                iters = sum(r.num_iters for r in sims)
                acc = sum(r.num_tokens - r.num_iters for r in sims) / max(
                    1, iters * k
                )
                results[name].setdefault(tok_name, {})[str(k)] = {
                    "tokens": tot,
                    "iters": iters,
                    "emitted_per_iter": round(tot / max(1, iters), 4),
                    "acceptance": round(acc, 4),
                }
    return results


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--k", type=int, nargs="+", default=[1, 2, 3, 4, 5, 6])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pages", type=int, default=3)
    ap.add_argument("--json", default=None)
    ap.add_argument(
        "--cost-ratios",
        default='{"3": 1.33}',
        help="measured verify/plain step-cost ratio per k "
             "(BENCH_SPEC_CURVE_r3: 1.33 at k=3)",
    )
    args = ap.parse_args(argv)

    ratios = {int(k): float(v)
              for k, v in json.loads(args.cost_ratios).items()}
    results = measure(args.k, args.seed, args.pages)

    print(f"{'workload':<14} {'tok':>6} {'k':>2} {'emit/iter':>9} "
          f"{'accept':>7} {'speedup':>8}")
    for name, toks in results.items():
        for tok_name, per_k in toks.items():
            for k, row in per_k.items():
                ratio = ratios.get(int(k))
                speed = (f"{row['emitted_per_iter'] / ratio:.2f}x"
                         if ratio else "-")
                print(f"{name:<14} {tok_name:>6} {k:>2} "
                      f"{row['emitted_per_iter']:>9.3f} "
                      f"{row['acceptance']:>7.3f} {speed:>8}")

    out = {"results": results, "cost_ratios": ratios,
           "seed": args.seed, "pages": args.pages}
    if args.json:
        with open(args.json, "w", encoding="utf-8") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
