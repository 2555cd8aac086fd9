"""Microbench: spec_decode_program vs decode_program, compile-separated.

Times the SECOND call at identical shapes (first call pays the XLA
compile), flagship weights, realistic 64-slot serving shapes. Two modes:

* default: zeros weights — per-iteration wall + tok/s at 100% draft
  acceptance (zeros-weights greedy is a period-1 loop, so every draft
  accepts — the verify-path CEILING, not a realistic mix).

* --acceptance-sweep: controlled-acceptance curve through the REAL
  draft+verify path (VERDICT r2 item 3). Acceptance is set by the
  GREEDY-SLOT FRACTION: greedy zeros-weight slots loop period-1 (drafts
  accept ~100%), temp-1 sampled slots draw from a uniform 151k-way
  softmax (drafts accept ~0%), so a mix of f greedy slots measures the
  verify path at aggregate acceptance ~f — including the wasted verify
  work on rejecting rows, which is exactly what the engine's adaptive
  cutoff reasons about. (Temperature sweeps on random weights do NOT
  work: even greedy random-weight streams stay n-gram-unpredictable for
  hundreds of tokens — measured acceptance 0 at every temp.) Publishes
  tok/s + emitted-tokens/slot-iteration at f in {0,.25,.5,.75,1} plus
  the implied break-even (= spec-iter cost / decode-iter cost) that
  spec_min_tokens_per_iter (default 1.5) must sit at; warns if the
  measured break-even drifts >20% from the default.

    python tools/bench_spec.py [--slots 64] [--steps 16] [--spec-k 3]
    python tools/bench_spec.py --acceptance-sweep
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=64)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--spec-k", type=int, default=3)
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=128,
                    help="starting sequence length per slot")
    ap.add_argument("--acceptance-sweep", action="store_true",
                    help="measure tok/s vs draft acceptance (zeros "
                    "weights, greedy-slot-fraction-controlled mix)")
    ap.add_argument("--fractions", type=str, default="0,0.25,0.5,0.75,1.0")
    ap.add_argument("--top-p", type=float, default=1.0,
                    help="<1 measures the NUCLEUS-exact verify program "
                    "(top-K truncated acceptance; r3) — overhead shows in "
                    "spec_ms_per_iter vs the default full-vocab program")
    ap.add_argument("--k-list", type=str, default=None,
                    help="measure verify/plain iteration-cost ratios at "
                    "these k values in ONE process (the tunnel drifts 3-5x "
                    "between processes) — prints JSON with a 'ratios' map "
                    "for tools/spec_realism.py --cost-ratios")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from dots_ocr_tpu.engine.kv_cache import PagedKV
    from dots_ocr_tpu.engine.scheduler import (
        decode_program,
        spec_decode_program,
    )
    from dots_ocr_tpu.models.config import DotsOCRConfig
    from dots_ocr_tpu.models.init import zeros_params

    log(f"devices: {jax.devices()}")
    config = DotsOCRConfig.flagship()
    params = zeros_params(config)

    s, ps, ctx = args.slots, args.page_size, args.ctx
    nq = args.spec_k + 1
    # Room for ctx + (chained) steps*nq new tokens per chunk x 4 chains.
    pages_per_seq = -(-(ctx + 4 * args.steps * nq + ps) // ps)
    mp = 1
    while mp < pages_per_seq:
        mp *= 2
    num_pages = s * mp + 1
    paged = PagedKV.create(config.decoder, num_pages, ps, dtype=jnp.bfloat16)
    tables = jnp.asarray(
        np.arange(s * mp, dtype=np.int32).reshape(s, mp)
    )  # unique pages per slot (page 0 reuse is harmless here)
    tokens = jnp.full((s,), 11, jnp.int32)
    positions = jnp.full((s,), ctx, jnp.int32)
    active = jnp.ones((s,), bool)
    temps = jnp.zeros((s,), jnp.float32)
    top_ps = jnp.full((s,), args.top_p, jnp.float32)
    nucleus = args.top_p < 1.0
    rng = jnp.tile(jax.random.PRNGKey(0)[None, :], (s, 1))  # per-slot keys

    def run_decode(paged):
        return decode_program(
            params, config, paged, tokens, positions, tables, active,
            temps, top_ps, rng, page_size=ps, num_steps=args.steps,
            attn_impl="paged", nucleus=False,
        )

    def run_spec(paged, buf):
        return spec_decode_program(
            params, config, paged, buf, tokens, positions,
            jnp.zeros((s,), jnp.int32), tables, active, temps, top_ps,
            rng, page_size=ps, num_steps=args.steps, spec_k=args.spec_k,
            attn_impl="paged", nucleus=nucleus,
        )

    if args.k_list:
        # Verify/plain cost ratio per k, one process (VERDICT r4 item 5):
        # the verify program runs k+1 token positions per iteration, so its
        # iteration cost grows with k; the realism tool crosses these
        # ratios with measured acceptance to pick SPECULATE_K.
        import json

        ks = sorted({int(t) for t in args.k_list.split(",")})
        nq_max = max(ks) + 1
        pages_per_seq = -(-(ctx + 4 * args.steps * nq_max + ps) // ps)
        mp = 1
        while mp < pages_per_seq:
            mp *= 2
        num_pages = s * mp + 1
        paged = PagedKV.create(config.decoder, num_pages, ps,
                               dtype=jnp.bfloat16)
        tables = jnp.asarray(
            np.arange(s * mp, dtype=np.int32).reshape(s, mp)
        )
        dec_times = []
        for rep in range(4):
            t0 = time.perf_counter()
            packed, carry, paged = decode_program(
                params, config, paged, tokens, positions, tables, active,
                temps, top_ps, rng, page_size=ps, num_steps=args.steps,
                attn_impl="paged", nucleus=False,
            )
            np.asarray(packed)
            dec_times.append(time.perf_counter() - t0)
        dec_ms = min(dec_times[1:]) / args.steps * 1e3
        log(f"decode: {dec_ms:.2f} ms/iter")
        ratios, spec_ms_map = {}, {}
        for k in ks:
            times = []
            for rep in range(4):
                buf = jnp.zeros((s, mp * ps), jnp.int32)
                t0 = time.perf_counter()
                packed, carry, paged, buf = spec_decode_program(
                    params, config, paged, buf, tokens, positions,
                    jnp.zeros((s,), jnp.int32), tables, active, temps,
                    top_ps, rng, page_size=ps, num_steps=args.steps,
                    spec_k=k, attn_impl="paged", nucleus=False,
                )
                np.asarray(packed)
                times.append(time.perf_counter() - t0)
            spec_ms = min(times[1:]) / args.steps * 1e3
            ratios[str(k)] = round(spec_ms / dec_ms, 3)
            spec_ms_map[str(k)] = round(spec_ms, 2)
            log(f"k={k}: {spec_ms:.2f} ms/iter -> ratio {ratios[str(k)]}")
        print(json.dumps({
            "metric": "spec_cost_ratios",
            "decode_ms_per_iter": round(dec_ms, 2),
            "spec_ms_per_iter": spec_ms_map,
            "ratios": ratios,
            "slots": s, "steps": args.steps, "page_size": ps, "ctx": ctx,
        }))
        return

    if args.acceptance_sweep:
        import json

        fracs = [float(t) for t in args.fractions.split(",")]
        curve = []
        n_chain = 4  # chunks chained per point: history warms, last measured
        for frac in fracs:
            n_greedy = int(round(frac * s))
            temps_arr = jnp.asarray(
                np.where(np.arange(s) < n_greedy, 0.0, 1.0), jnp.float32
            )
            # plain-decode baseline at this temperature
            dec_times = []
            for rep in range(3):
                t0 = time.perf_counter()
                packed, carry, paged = decode_program(
                    params, config, paged, tokens, positions, tables,
                    active, temps_arr, top_ps, rng, page_size=ps,
                    num_steps=args.steps, attn_impl="paged", nucleus=False,
                )
                np.asarray(packed)
                dec_times.append(time.perf_counter() - t0)
            # Speculative chunks CHAINED through the device carry: the
            # n-gram drafter proposes from each slot's own generated
            # history, which is EMPTY at chunk 1 (acceptance 0 by
            # construction). Warm n_chain-1 chunks so the measured chunk
            # sees steady-state history — the realistic serving regime.
            buf = jnp.zeros((s, mp * ps), jnp.int32)
            cur, pos = tokens, positions
            gstart = jnp.full((s,), ctx, jnp.int32)
            spec_best, spec_emitted = None, 0
            for chain in range(n_chain):
                t0 = time.perf_counter()
                packed, (cur, pos), paged, buf = spec_decode_program(
                    params, config, paged, buf, cur, pos,
                    gstart, tables, active, temps_arr, top_ps,
                    rng, page_size=ps, num_steps=args.steps,
                    spec_k=args.spec_k, attn_impl="paged",
                    nucleus=nucleus,
                )
                emitted = int(np.asarray(packed)[:, -1].sum())
                dt = time.perf_counter() - t0
                if chain == n_chain - 1:  # steady-state chunk
                    spec_best, spec_emitted = dt, emitted
            dec_best = min(dec_times[1:])
            per_iter = spec_emitted / (s * args.steps)
            acceptance = max(0.0, min(1.0, (per_iter - 1.0) / args.spec_k))
            point = dict(
                greedy_fraction=frac,
                acceptance=round(acceptance, 3),
                emitted_per_slot_iter=round(per_iter, 3),
                spec_tok_s=round(spec_emitted / spec_best, 0),
                decode_tok_s=round(s * args.steps / dec_best, 0),
                spec_ms_per_iter=round(spec_best / args.steps * 1e3, 2),
                decode_ms_per_iter=round(dec_best / args.steps * 1e3, 2),
                spec_speedup=round(
                    (spec_emitted / spec_best) / (s * args.steps / dec_best), 3
                ),
            )
            curve.append(point)
            log(json.dumps(point))
        # Break-even emitted/slot-iter: where spec tok/s == decode tok/s.
        ratio = np.mean([p["spec_ms_per_iter"] / p["decode_ms_per_iter"]
                         for p in curve])
        breakeven = float(ratio)
        default_cutoff = 1.5
        if not 0.8 * breakeven <= default_cutoff <= 1.2 * breakeven:
            log(f"WARNING: measured break-even {breakeven:.2f} emitted tokens/"
                f"slot-iter vs SchedulerConfig.spec_min_tokens_per_iter "
                f"{default_cutoff} — retune the default")
        out = {
            "metric": "spec_acceptance_curve",
            "curve": curve,
            "breakeven_tokens_per_iter": round(breakeven, 3),
            "default_cutoff": default_cutoff,
            "slots": s, "spec_k": args.spec_k, "steps": args.steps,
        }
        print(json.dumps(out))
        return

    def run_spec_fullvocab(paged, buf):
        # Same-process A/B partner for the nucleus program (tunnel drifts
        # 3-5x BETWEEN processes; within one it is stable).
        return spec_decode_program(
            params, config, paged, buf, tokens, positions,
            jnp.zeros((s,), jnp.int32), tables, active, temps,
            jnp.ones((s,), jnp.float32), rng, page_size=ps,
            num_steps=args.steps, spec_k=args.spec_k,
            attn_impl="paged", nucleus=False,
        )

    results = {}
    # decode_program baseline
    names = ("decode", "spec") + (("spec_fullvocab",) if nucleus else ())
    for name in names:
        times = []
        for rep in range(4):
            if name == "decode":
                t0 = time.perf_counter()
                packed, carry, paged = run_decode(paged)
                np.asarray(packed)
            else:
                buf = jnp.zeros((s, mp * ps), jnp.int32)
                t0 = time.perf_counter()
                if name == "spec":
                    packed, carry, paged, buf = run_spec(paged, buf)
                else:
                    packed, carry, paged, buf = run_spec_fullvocab(paged, buf)
                np.asarray(packed)
            dt = time.perf_counter() - t0
            times.append(dt)
            log(f"{name} rep{rep}: {dt*1e3:.1f} ms "
                f"({dt*1e3/args.steps:.2f} ms/iter)")
        best = min(times[1:])  # rep0 = compile
        per_iter = best / args.steps
        toks = s * args.steps * (1 if name == "decode" else nq)
        results[name] = dict(
            ms_per_iter=round(per_iter * 1e3, 2),
            tok_s_ceiling=round(toks / best, 0),
        )
    import json

    out = {
        "metric": "spec_verify_ceiling_tok_s",
        "value": results["spec"]["tok_s_ceiling"],
        "decode_ms_per_iter": results["decode"]["ms_per_iter"],
        "spec_ms_per_iter": results["spec"]["ms_per_iter"],
        "decode_tok_s": results["decode"]["tok_s_ceiling"],
        "slots": s, "spec_k": args.spec_k, "steps": args.steps,
        "top_p": args.top_p,
    }
    if "spec_fullvocab" in results:
        out["spec_fullvocab_ms_per_iter"] = (
            results["spec_fullvocab"]["ms_per_iter"]
        )
        out["nucleus_overhead_pct"] = round(
            100.0 * (results["spec"]["ms_per_iter"]
                     / results["spec_fullvocab"]["ms_per_iter"] - 1.0), 1
        )
    log(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
