"""Decompose the decode-iteration cost in the BENCH GEOMETRY (S=64,
ctx ~270, page 128, 4 pages/seq — bench.py's shipping wave mid-point).

Where do the ~10 ms/iter (6.3k tok/s at 64 slots) go?  Variants, all
16-step while_loop chunks through the REAL decoder step:

  full        - attention + logits (the decode_program body)
  noattn      - attention output zeroed (skips the paged kernel)
  nologits    - argmax over hidden[:, :64] (skips the 152k-vocab unembed)
  mlponly     - both skipped: the transformer body / param-stream floor

Each variant runs with bf16 AND int8 weight-only params, so the probe
answers BOTH round-3-verdict questions: (a) which phase eats the step,
(b) whether the int8 convert-in-dot actually halves the param-read time
of the phase it targets (mlponly bf16 vs int8 is the pure param-read
delta; ~3.1 GB vs ~1.6 GB -> expect ~1.9 ms at v5e HBM peak).

Usage: python tools/bench_decode_anatomy.py [--slots 64] [--ctx 270]
"""
import argparse
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from dots_ocr_tpu.engine.kv_cache import PagedKV
from dots_ocr_tpu.engine.scheduler import decode_program
from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.decoder import (
    decoder_decode_step_paged,
    embed_tokens,
    logits_from_hidden,
)
from dots_ocr_tpu.models.init import zeros_params

ap = argparse.ArgumentParser()
ap.add_argument("--slots", type=int, default=64)
ap.add_argument("--ctx", type=int, default=270)
ap.add_argument("--steps", type=int, default=16)
ap.add_argument("--page-size", type=int, default=128)
args = ap.parse_args()

S, CTX, STEPS, PS = args.slots, args.ctx, args.steps, args.page_size
MP = (CTX + STEPS + PS - 1) // PS + 1  # pages per seq, covers ctx+chunk

print(f"devices: {jax.devices()}", file=sys.stderr)
config = DotsOCRConfig.flagship()
params_bf16 = zeros_params(config)
from dots_ocr_tpu.models.quantize import quantize_decoder_params

params_int8 = quantize_decoder_params(params_bf16)


def setup():
    paged = PagedKV.create(config.decoder, S * MP + 1, PS)
    tables = jnp.arange(1, S * MP + 1, dtype=jnp.int32).reshape(S, MP)
    tokens = jnp.full((S,), 5, jnp.int32)
    positions = jnp.full((S,), CTX, jnp.int32)
    return paged, tables, tokens, positions


_, TABLES, TOKENS, POSITIONS = setup()


def slot_of(pos):
    page = jnp.take_along_axis(TABLES, (pos // PS)[:, None], axis=1)[:, 0]
    return page * PS + pos % PS


@partial(jax.jit, static_argnames=("attn", "logits", "quant"),
         donate_argnames=("paged",))
def variant(paged, tokens, positions, attn: str, logits: bool, quant: bool):
    p = params_int8 if quant else params_bf16

    def body(i, state):
        cur, pos, k_list, v_list = state
        slots = slot_of(pos)
        x = embed_tokens(p["decoder"], cur)
        hidden, k_list, v_list, _, _ = decoder_decode_step_paged(
            p["decoder"], config.decoder, x, pos, k_list, v_list,
            TABLES, pos + 1, slots, PS, attn_impl=attn)
        if logits:
            lg = logits_from_hidden(p["decoder"], config.decoder, hidden)
            nxt = jnp.argmax(lg, -1).astype(jnp.int32)
        else:
            nxt = jnp.argmax(hidden[:, :64], -1).astype(jnp.int32)
        return nxt, pos + 1, k_list, v_list

    cur, pos, k, v = jax.lax.fori_loop(
        0, STEPS, body, (tokens, positions, paged.k, paged.v))
    return cur, PagedKV(k, v)


def bench(name, attn, logits, quant, reps=4):
    best = None
    for r in range(reps):
        paged, *_ = setup()
        t0 = time.perf_counter()
        out, _pg = variant(paged, TOKENS, POSITIONS,
                           attn=attn, logits=logits, quant=quant)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        if r > 0:  # rep 0 = compile
            best = dt if best is None else min(best, dt)
    print(f"{name:28s}: {best * 1e3 / STEPS:6.2f} ms/iter "
          f"({best * 1e3:7.1f} ms/chunk)", file=sys.stderr)
    return best * 1e3 / STEPS


rows = {}
for quant in (False, True):
    tag = "int8" if quant else "bf16"
    for name, attn, logits in (
        ("full", "paged", True),
        ("noattn", "skip", True),
        ("nologits", "paged", False),
        ("mlponly", "skip", False),
    ):
        rows[f"{name}/{tag}"] = bench(f"{name}/{tag}", attn, logits, quant)

print("\n--- attribution (ms/iter) ---", file=sys.stderr)
for tag in ("bf16", "int8"):
    full = rows[f"full/{tag}"]
    attn_cost = full - rows[f"noattn/{tag}"]
    logit_cost = full - rows[f"nologits/{tag}"]
    body = rows[f"mlponly/{tag}"]
    print(f"{tag}: full={full:.2f} attn≈{attn_cost:.2f} "
          f"logits≈{logit_cost:.2f} body={body:.2f}", file=sys.stderr)
print(f"param-read delta (mlponly bf16-int8): "
      f"{rows['mlponly/bf16'] - rows['mlponly/int8']:.2f} ms/iter "
      f"(expect ~1.9 if convert-in-dot fuses)", file=sys.stderr)

# the real decode_program, both dtypes (sanity vs bench.py's numbers)
for quant, p in (("bf16", params_bf16), ("int8", params_int8)):
    best = None
    for r in range(3):
        paged, tables, tokens, positions = setup()
        active = jnp.ones((S,), bool)
        temps = jnp.zeros((S,), jnp.float32)
        top_ps = jnp.ones((S,), jnp.float32)
        rng = jnp.tile(jax.random.PRNGKey(0)[None, :], (S, 1))
        t0 = time.perf_counter()
        packed, carry, paged2 = decode_program(
            p, config, paged, tokens, positions, tables, active,
            temps, top_ps, rng, page_size=PS, num_steps=STEPS,
            attn_impl="paged")
        packed.block_until_ready()
        dt = time.perf_counter() - t0
        if r > 0:
            best = dt if best is None else min(best, dt)
    print(f"decode_program/{quant}: {best * 1e3 / STEPS:.2f} ms/iter "
          f"-> {S * STEPS / best:.0f} tok/s", file=sys.stderr)
