"""Microbenchmark: weight-only matmul variants at decode shapes (TPU).

Times each flagship decoder linear at serving decode batch sizes across
bf16 / int8 (XLA convert-in-dot, the shipping path) / int4 (Pallas
grouped-dequant, ops/int4_matmul.py) and reports effective HBM bandwidth
per variant — the decision artifact for VERDICT r4 item 4 ("int4
weight-only decode, or prove int8 structural").

Usage: python tools/bench_int4.py [--s 64] [--iters 200]
Writes one JSON line per (shape, variant).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


# (name, in, out) — the flagship decoder's linears (models/config.py).
SHAPES = [
    ("wq", 1536, 1536),
    ("wkv", 1536, 256),
    ("wo", 1536, 1536),
    ("gate_up", 1536, 8960),
    ("down", 8960, 1536),
]


def time_fn(fn, args, iters):
    jf = jax.jit(fn)
    # Scalar fetch, not block_until_ready: through the axon tunnel the
    # latter returns once work is enqueued, so an undrained queue makes the
    # subsequent timed loop report dispatch cost instead of device time.
    float(jf(*args).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jf(*args)
    float(r.sum())
    return (time.perf_counter() - t0) / iters


def bench_chain(args):
    """One-dispatch 28-layer MLP chain (gate_up + down per layer, scanned
    over stacked weights) — the representative decode-step measurement.
    The per-matmul mode is dispatch-floor-bound (~14 us/call through the
    tunnel) at decode shapes; chaining amortizes it away exactly like the
    real engine's multi-step decode chunks do."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dots_ocr_tpu.models.quantize import (
        quantize_kernel,
        quantize_kernel_int4,
    )
    from dots_ocr_tpu.ops.int4_matmul import int4_matmul

    L, IN, MID = 28, 1536, 8960
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (args.s, IN), jnp.bfloat16)
    gate = jax.random.normal(key, (L, IN, MID), jnp.float32) * 0.02
    down = jax.random.normal(key, (L, MID, IN), jnp.float32) * 0.02

    def stack(q, w):
        return jax.vmap(q)(w)

    packs = {
        "bf16": (gate.astype(jnp.bfloat16), down.astype(jnp.bfloat16)),
        "int8": (stack(quantize_kernel, gate), stack(quantize_kernel, down)),
        "int4_pallas": (
            stack(quantize_kernel_int4, gate),
            stack(quantize_kernel_int4, down),
        ),
    }
    del gate, down

    def apply_one(x, wl, act_quant):
        if isinstance(wl, dict) and "qint4" in wl:
            return int4_matmul(x, wl["qint4"], wl["scale4"],
                               act_quant=act_quant)
        if isinstance(wl, dict):
            return (jnp.einsum(
                "si,io->so", x, wl["qint8"].astype(x.dtype),
                preferred_element_type=jnp.float32,
            ) * wl["scale"]).astype(x.dtype)
        return jnp.einsum(
            "si,io->so", x, wl, preferred_element_type=jnp.float32
        ).astype(x.dtype)

    results = {}
    for name in ("bf16", "int8", "int4_pallas", "int4_w4a8"):
        g, d = packs["int4_pallas" if name == "int4_w4a8" else name]
        aq = name == "int4_w4a8"

        # Weights MUST be jit arguments, never defaults/closures: jit embeds
        # captured arrays as MLIR constants, which pulls the full 1.5 GB
        # stack device->host during lowering (a multi-minute stall through
        # the axon tunnel). aq is a Python bool resolved at trace time via
        # closure, so each variant gets its own jit cache entry.
        @jax.jit
        def chain(x, g, d):
            def body(x, wl):
                gl, dl = wl
                h = apply_one(x, gl, aq)
                # keep magnitudes bounded across 28 layers
                h = (h * 0.05).astype(x.dtype)
                y = apply_one(h, dl, aq)
                return (y * 0.05).astype(x.dtype), ()

            out, _ = jax.lax.scan(body, x, (g, d))
            return out

        # Force a REAL drain: through the tunnel, block_until_ready returns
        # once work is enqueued; only a value fetch round-trips the device.
        float(chain(x0, g, d).sum())
        n = 30
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            # dependency-chain iterations so no dispatch can be elided
            x = chain(x, g, d)
        float(x.sum())
        dt = (time.perf_counter() - t0) / n
        bytes_per = {
            "bf16": L * (IN * MID + MID * IN) * 2,
            "int8": L * (IN * MID + MID * IN),
            "int4_pallas": L * (IN * MID + MID * IN) // 2,
            "int4_w4a8": L * (IN * MID + MID * IN) // 2,
        }[name]
        results[name] = {
            "ms": round(dt * 1e3, 3),
            "us_per_layer": round(dt / L * 1e6, 1),
            "eff_gb_s": round(bytes_per / dt / 1e9, 1),
        }
        log(f"chain {name:12s} {dt*1e3:8.3f} ms  "
            f"({dt/L*1e6:6.1f} us/layer, {results[name]['eff_gb_s']:7.1f} "
            "GB/s weight stream)")
    out = {"mode": "chain", "s": args.s, "layers": L, "results": results}
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=64, help="decode batch rows")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--json", default=None)
    ap.add_argument("--chain", action="store_true",
                    help="28-layer scanned MLP chain in one dispatch (the "
                    "representative decode measurement)")
    args = ap.parse_args()
    if args.chain:
        bench_chain(args)
        return

    from dots_ocr_tpu.models.quantize import (
        quantize_kernel,
        quantize_kernel_int4,
    )
    from dots_ocr_tpu.ops.int4_matmul import int4_matmul

    log(f"device: {jax.devices()[0]}")
    rows = []
    key = jax.random.PRNGKey(0)
    for name, in_dim, out_dim in SHAPES:
        x = jax.random.normal(key, (args.s, in_dim), jnp.bfloat16)
        w = jax.random.normal(key, (in_dim, out_dim), jnp.float32) / 32
        wb = w.astype(jnp.bfloat16)
        q8 = quantize_kernel(w)
        q4 = quantize_kernel_int4(w)

        variants = {
            "bf16": (
                lambda x, w: jnp.einsum(
                    "si,io->so", x, w, preferred_element_type=jnp.float32
                ),
                (x, wb),
                in_dim * out_dim * 2,
            ),
            "int8": (
                lambda x, q, s: jnp.einsum(
                    "si,io->so", x, q.astype(x.dtype),
                    preferred_element_type=jnp.float32,
                ) * s,
                (x, q8["qint8"], q8["scale"]),
                in_dim * out_dim,
            ),
            "int4_pallas": (
                lambda x, p, s: int4_matmul(x, p, s),
                (x, q4["qint4"], q4["scale4"]),
                in_dim * out_dim // 2 + q4["scale4"].size * 4,
            ),
            "int4_w4a8": (
                lambda x, p, s: int4_matmul(x, p, s, act_quant=True),
                (x, q4["qint4"], q4["scale4"]),
                in_dim * out_dim // 2 + q4["scale4"].size * 4,
            ),
        }
        for vname, (fn, a, bytes_read) in variants.items():
            dt = time_fn(fn, a, args.iters)
            row = {
                "shape": name, "in": in_dim, "out": out_dim, "s": args.s,
                "variant": vname, "us": round(dt * 1e6, 1),
                "eff_gb_s": round(bytes_read / dt / 1e9, 1),
            }
            rows.append(row)
            log(f"{name:8s} {vname:12s} {row['us']:8.1f} us  "
                f"{row['eff_gb_s']:7.1f} GB/s")

    # Weighted per-decode-step projection over a full layer stack:
    # 28 layers x (wq + 2*wkv(k,v) + wo + 2*gate_up + down).
    per_layer = {}
    for v in ("bf16", "int8", "int4_pallas", "int4_w4a8"):
        t = {r["shape"]: r["us"] for r in rows if r["variant"] == v}
        per_layer[v] = (
            t["wq"] + 2 * t["wkv"] + t["wo"] + 2 * t["gate_up"] + t["down"]
        )
        log(f"step projection ({v}): 28 x {per_layer[v]:.0f} us = "
            f"{28 * per_layer[v] / 1000:.2f} ms "
            f"-> {args.s / (28 * per_layer[v] / 1e6):.0f} tok/s ceiling")
    out = {"s": args.s, "rows": rows, "per_layer_us": per_layer}
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
