import time
import jax, jax.numpy as jnp, numpy as np
from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.init import zeros_params
from dots_ocr_tpu.engine.scheduler import decode_program
from dots_ocr_tpu.engine.kv_cache import PagedKV

cfg = DotsOCRConfig.flagship()
params = zeros_params(cfg)
S, page_size, pool, mp = 64, 256, 640, 8
rng = np.random.RandomState(0)
tables = np.zeros((S, mp), np.int32)
for s in range(S):
    tables[s] = (np.arange(mp) + 1 + s * mp) % pool
for quant, tag in [(False, "bf16"), (True, "int8")]:
    paged = PagedKV.create(cfg.decoder, pool, page_size, quantized=quant)
    def call(seed, length, paged):
        tokens = jnp.asarray(rng.randint(1, 150000, (S,)).astype(np.int32))
        positions = jnp.full((S,), length, jnp.int32)
        active = jnp.ones((S,), bool)
        t0 = time.perf_counter()
        out = decode_program(params, cfg, paged, tokens, positions,
            jnp.asarray(tables), active, jnp.zeros(S), jnp.ones(S),
            jax.random.PRNGKey(seed), page_size=page_size, num_steps=16,
            attn_impl="paged", nucleus=False)
        np.asarray(out[0])
        return time.perf_counter()-t0, out[2]
    _, paged = call(0, 300, paged)
    ts = []
    for i in range(3):
        dt, paged = call(i+1, 300, paged)
        ts.append(dt)
    t = min(ts)
    print(f"{tag} S={S}: {t/16*1e3:.2f} ms/iter -> {S*16/t:.0f} tok/s", flush=True)
