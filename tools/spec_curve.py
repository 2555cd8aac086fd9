"""Speculation decision artifact: measured cost ratios x realistic acceptance.

One command produces BENCH_SPEC_CURVE_r5-style JSON (VERDICT r4 item 5):

  1. ``tools/bench_spec.py --k-list 1,2,3,4,5,6`` on the TPU — verify/plain
     iteration-cost ratio per k, one process (drift-free).
  2. ``tools/spec_realism.py`` on the host — the engine's exact drafter
     replayed over realistic layout/markdown/table/SVG token streams
     (engine/spec_sim.py, pinned to the device program by test) —
     emitted-tokens/iteration per task family per k.
  3. Cross: projected speedup(family, k) = emitted_per_iter / cost_ratio;
     the artifact records the argmax per family, the shipped default, and
     whether the default needs changing.

    python tools/spec_curve.py --json BENCH_SPEC_CURVE_r5.json
    python tools/spec_curve.py --ratios '{"3": 1.33}' --skip-tpu   # reuse
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, nargs="+", default=[1, 2, 3, 4, 5, 6])
    ap.add_argument("--json", default=None)
    ap.add_argument("--ratios", default=None,
                    help="pre-measured cost ratios JSON (skips the TPU run)")
    ap.add_argument("--skip-tpu", action="store_true")
    args = ap.parse_args(argv)

    ks = sorted(set(args.k))
    if args.ratios:
        cost = {"ratios": json.loads(args.ratios)}
    elif args.skip_tpu:
        raise SystemExit("--skip-tpu needs --ratios")
    else:
        klist = ",".join(str(k) for k in ks)
        log(f"[1/2] on-chip cost ratios (k in {klist})...")
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "bench_spec.py"),
             "--k-list", klist],
            capture_output=True, text=True, timeout=3600, cwd=REPO,
        )
        if r.returncode != 0:
            raise SystemExit(f"bench_spec failed: {r.stderr[-500:]}")
        cost = json.loads(r.stdout.strip().splitlines()[-1])

    ratios = {int(k): float(v) for k, v in cost["ratios"].items()}
    log(f"ratios: {ratios}")

    log("[2/2] realistic acceptance (host drafter replica)...")
    from tools.spec_realism import main as realism_main  # noqa: E402

    realism_out = os.path.join("/tmp", "spec_realism_curve.json")
    realism_main(["--k"] + [str(k) for k in ks] + ["--json", realism_out])
    with open(realism_out, encoding="utf-8") as f:
        realism = json.load(f)

    # realism format: {"results": {family: {tokenizer: {str(k): {...}}}}}
    table = {}
    best = {}
    for fam, toks in realism["results"].items():
        for tok_name, per_k in toks.items():
            for kstr, row in per_k.items():
                k = int(kstr)
                if k not in ratios:
                    continue
                speed = row["emitted_per_iter"] / ratios[k]
                table.setdefault(fam, {}).setdefault(tok_name, {})[k] = {
                    "acceptance": row["acceptance"],
                    "emitted_per_iter": row["emitted_per_iter"],
                    "cost_ratio": ratios[k],
                    "speedup": round(speed, 3),
                }
    for fam, toks in table.items():
        # Decision basis: the PESSIMISTIC tokenizer (words) if present —
        # real BPE sits between the two brackets.
        basis = toks.get("words") or next(iter(toks.values()))
        k_best = max(basis, key=lambda k: basis[k]["speedup"])
        best[fam] = {
            "k": k_best,
            "speedup": basis[k_best]["speedup"],
            "speedup_at_k3": basis.get(3, {}).get("speedup"),
            "above_breakeven": basis[k_best]["speedup"] > 1.0,
        }

    # Shipped-default recommendation: best k for the serving-default
    # workload (layout JSON), pessimistic bracket.
    ship = best.get("layout_json", {})
    out = {
        "metric": "spec_curve",
        "cost": cost,
        "per_family": table,
        "best_k": best,
        "shipped_default": 3,
        "recommended_default": ship.get("k"),
        "note": (
            "speedup = emitted_per_iter / cost_ratio; emitted from the "
            "exact host drafter replica over synthetic streams bracketing "
            "real BPE (bytes optimistic / words pessimistic); decision "
            "basis is the pessimistic bracket. Near-break-even families "
            "(SVG) rely on the engine's adaptive cutoff "
            "(spec_min_tokens_per_iter) rather than a per-task k."
        ),
    }
    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w", encoding="utf-8") as f:
            json.dump(out, f, indent=2)
        log(f"wrote {args.json}")


if __name__ == "__main__":
    main()
