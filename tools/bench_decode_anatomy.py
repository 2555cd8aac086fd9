"""Decompose the decode iteration cost: where do 11.5ms/iter go?

Variants (all 16-step while_loop chunks, 64 slots, ctx 128, bf16 zeros):
  full        - the real decode_program
  noattn      - attention output replaced by zeros (skips paged kernel)
  nologits    - hidden -> argmax of hidden (skips the 152k logits matmul + sampler)
  mlponly     - transformer body without attention AND without logits
  slots8/16   - full program at smaller slot counts (fixed-overhead probe)
"""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from dots_ocr_tpu.engine.kv_cache import PagedKV
from dots_ocr_tpu.engine.scheduler import decode_program
from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.init import zeros_params
from dots_ocr_tpu.models.decoder import decoder_decode_step_paged, embed_tokens, logits_from_hidden

print("devices:", jax.devices(), file=sys.stderr)
config = DotsOCRConfig.flagship()
params = zeros_params(config)
ps, mp, ctx, steps = 128, 32, 128, 16

def setup(s):
    paged = PagedKV.create(config.decoder, s * mp + 1, ps)
    tables = jnp.arange(1, s * mp + 1, dtype=jnp.int32).reshape(s, mp)
    tokens = jnp.full((s,), 5, jnp.int32)
    positions = jnp.full((s,), ctx, jnp.int32)
    active = jnp.ones((s,), bool)
    temps = jnp.zeros((s,), jnp.float32)
    top_ps = jnp.ones((s,), jnp.float32)
    return paged, tables, tokens, positions, active, temps, top_ps

def timeit(name, fn, *args, reps=4):
    best = None
    for r in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(lambda a: a.block_until_ready() if hasattr(a, 'block_until_ready') else a, out)
        dt = time.perf_counter() - t0
        if r > 0:
            best = dt if best is None else min(best, dt)
    print(f"{name}: {best*1e3/steps:.2f} ms/iter ({best*1e3:.1f} ms/chunk)", file=sys.stderr)
    return best

# full program at several slot counts
for s in (64, 16, 8):
    paged, tables, tokens, positions, active, temps, top_ps = setup(s)
    rng = jnp.tile(jax.random.PRNGKey(0)[None, :], (s, 1))
    def run(paged=paged):
        packed, carry, paged2 = decode_program(
            params, config, paged, tokens, positions, tables, active,
            temps, top_ps, rng, page_size=ps, num_steps=steps,
            attn_impl="paged")
        return packed
    timeit(f"full s={s}", run)

# variants at 64 slots: hand-built loop
s = 64
paged, tables, tokens, positions, active, temps, top_ps = setup(s)

def slot_of(pos):
    page = jnp.take_along_axis(tables, (pos // ps)[:, None], axis=1)[:, 0]
    return page * ps + pos % ps

@partial(jax.jit, static_argnames=("attn", "logits"), donate_argnames=("paged",))
def variant(paged, tokens, positions, attn: str, logits: bool):
    def body(i, state):
        cur, pos, k_list, v_list = state
        slots = slot_of(pos)
        x = embed_tokens(params["decoder"], cur)
        hidden, k_list, v_list, _, _ = decoder_decode_step_paged(
            params["decoder"], config.decoder, x, pos, k_list, v_list,
            tables, pos + 1, slots, ps, attn_impl=attn)
        if logits:
            lg = logits_from_hidden(params["decoder"], config.decoder, hidden)
            nxt = jnp.argmax(lg, -1).astype(jnp.int32)
        else:
            nxt = jnp.argmax(hidden[:, :64], -1).astype(jnp.int32)
        return nxt, pos + 1, k_list, v_list
    cur, pos, k, v = jax.lax.fori_loop(
        0, steps, body, (tokens, positions, paged.k, paged.v))
    return cur, PagedKV(k, v)

for name, attn, logits in (
    ("full-rebuilt", "paged", True),
    ("noattn", "skip", True),
    ("nologits", "paged", False),
    ("mlponly", "skip", False),
):
    try:
        def run(paged=paged):
            out, p2 = variant(paged, tokens, positions, attn=attn, logits=logits)
            return out
        # donation: recreate pool each timing rep is costly; instead pass fresh each call
        best = None
        for r in range(4):
            pg, *_ = setup(s)
            t0 = time.perf_counter()
            out, pg2 = variant(pg, tokens, positions, attn=attn, logits=logits)
            out.block_until_ready()
            dt = time.perf_counter() - t0
            if r > 0:
                best = dt if best is None else min(best, dt)
        print(f"{name}: {best*1e3/steps:.2f} ms/iter", file=sys.stderr)
    except Exception as ex:
        print(f"{name}: FAILED {ex}", file=sys.stderr)
