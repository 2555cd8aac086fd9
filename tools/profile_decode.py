"""Capture an XLA trace of the serving decode program (bench geometry).

Writes a jax.profiler trace of ~3 decode chunks (the exact
``decode_program`` call bench.py steady-state runs: S slots, ctx around
the bench wave midpoint, 16-step chunks) to --out, then prints the top
HLO ops by self time so the per-step overhead can be attributed.

Usage: python tools/profile_decode.py [--slots 64] [--ctx 270]
       [--quant int8|bf16] [--out /tmp/decode_trace]
"""
import argparse
import glob
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

ap = argparse.ArgumentParser()
ap.add_argument("--slots", type=int, default=64)
ap.add_argument("--ctx", type=int, default=270)
ap.add_argument("--steps", type=int, default=16)
ap.add_argument("--page-size", type=int, default=128)
ap.add_argument("--quant", default="int8", choices=("int8", "bf16"))
ap.add_argument("--out", default="/tmp/decode_trace")
args = ap.parse_args()

cache_dir = "/root/repo/.cache/xla"
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

print(f"devices: {jax.devices()}", file=sys.stderr)

from dots_ocr_tpu.engine.kv_cache import PagedKV
from dots_ocr_tpu.engine.scheduler import decode_program
from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.init import zeros_params
from dots_ocr_tpu.models.quantize import quantize_decoder_params

S, CTX, STEPS, PS = args.slots, args.ctx, args.steps, args.page_size
MP = (CTX + STEPS + PS - 1) // PS + 1

config = DotsOCRConfig.flagship()
params = zeros_params(config)
if args.quant == "int8":
    params = quantize_decoder_params(params)


def setup():
    paged = PagedKV.create(config.decoder, S * MP + 1, PS)
    tables = jnp.arange(1, S * MP + 1, dtype=jnp.int32).reshape(S, MP)
    tokens = jnp.full((S,), 5, jnp.int32)
    positions = jnp.full((S,), CTX, jnp.int32)
    return paged, tables, tokens, positions


def chunk(paged, tables, tokens, positions):
    active = jnp.ones((S,), bool)
    temps = jnp.zeros((S,), jnp.float32)
    top_ps = jnp.ones((S,), jnp.float32)
    keys = jnp.tile(
        jax.random.key_data(jax.random.PRNGKey(0))[None, :], (S, 1))
    return decode_program(
        params, config, paged, tokens, positions, tables, active,
        temps, top_ps, keys, page_size=PS, num_steps=STEPS,
        attn_impl="paged", nucleus=False)


# warm (compile)
paged, tables, tokens, positions = setup()
packed, carry, paged = chunk(paged, tables, tokens, positions)
packed.block_until_ready()

# timed reps without trace (ground truth); chain the device carry so each
# chunk continues where the last stopped (page tables cover the span)
best = None
for r in range(3):
    t0 = time.perf_counter()
    packed, carry, paged = chunk(paged, tables, carry[0], carry[1])
    packed.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"  rep {r}: {dt * 1e3 / STEPS:.2f} ms/iter "
          f"(decoded {int(packed[0, -1])}, pos {int(carry[1][0])})",
          file=sys.stderr)
    best = dt if best is None else min(best, dt)
print(f"steady: {best * 1e3 / STEPS:.2f} ms/iter "
      f"-> {S * STEPS / best:.0f} tok/s", file=sys.stderr)

os.makedirs(args.out, exist_ok=True)
with jax.profiler.trace(args.out):
    for _ in range(2):
        packed, carry, paged = chunk(paged, tables, carry[0], carry[1])
    packed.block_until_ready()
print(f"trace written to {args.out}", file=sys.stderr)
for f in glob.glob(os.path.join(args.out, "**", "*"), recursive=True):
    if os.path.isfile(f):
        print("  ", f, os.path.getsize(f), file=sys.stderr)
