"""On-chip correctness check for the paged-attention kernels.

The pytest tier validates the kernels in interpret mode on CPU; this probe
runs the REAL Mosaic kernels on the attached TPU against the XLA reference
— the cross-sequence DMA double-buffering (single-block regime) depends on
grid-sequential semaphore/scratch persistence that interpret mode cannot
faithfully exercise. Covers bf16 + int8-KV, mixed lengths including
inactive (0) rows, first/last-row inactivity, multi-block contexts, and
the multi-query (speculative verify) shape.

Usage: python tools/check_paged_tpu.py
Exits nonzero on any mismatch.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dots_ocr_tpu.ops.paged_attention import (
    paged_attention_multipage,
    paged_attention_multiquery,
    paged_attention_multiquery_reference,
    paged_attention_reference,
)

print(f"devices: {jax.devices()}", file=sys.stderr)

KV, PS, D, H = 2, 128, 128, 12
failures = 0


def check(tag, got, want, tol):
    global failures
    got, want = np.asarray(got, np.float32), np.asarray(want, np.float32)
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-6)
    ok = err < tol
    print(f"  {tag:44s} rel_err={err:.2e} {'ok' if ok else 'FAIL'}",
          file=sys.stderr)
    failures += 0 if ok else 1


def run_case(tag, batch, max_pages, lengths, quantized, nq=1, seed=0,
             adversarial_scales=False, tol=None):
    rng = np.random.RandomState(seed)
    num_pages = batch * max_pages + 1
    kp = jnp.asarray(
        rng.randn(KV, num_pages, PS, D).astype(np.float32) * 0.3,
        jnp.bfloat16)
    vp = jnp.asarray(
        rng.randn(KV, num_pages, PS, D).astype(np.float32) * 0.3,
        jnp.bfloat16)
    pidx = jnp.asarray(
        rng.permutation(num_pages - 1)[: batch * max_pages].reshape(
            batch, max_pages) + 1, jnp.int32)
    lens = jnp.asarray(lengths, jnp.int32)
    q = jnp.asarray(
        rng.randn(batch, nq, H, D).astype(np.float32) * 0.3, jnp.bfloat16)
    kwargs = {}
    if quantized:
        if adversarial_scales:
            # 100x random per-token scale spread — far beyond what the
            # engine's absmax/127 quantizer produces. The int8 PV dot
            # folds V scales into the probability row before re-quantizing
            # it, so its error grows with intra-block scale spread; this
            # case bounds the blow-up rather than asserting engine
            # accuracy (hence the loose tolerance).
            sk = jnp.asarray(
                0.01 + rng.rand(KV, num_pages, PS).astype(np.float32))
            sv = jnp.asarray(
                0.01 + rng.rand(KV, num_pages, PS).astype(np.float32))
        else:
            # Engine-realistic: per-(head, token) absmax/127, exactly
            # engine/kv_cache.py::quantize_kv.
            amk = np.abs(np.asarray(kp, np.float32)).max(axis=-1)
            amv = np.abs(np.asarray(vp, np.float32)).max(axis=-1)
            sk = jnp.asarray(np.where(amk > 0, amk / 127.0, 1.0))
            sv = jnp.asarray(np.where(amv > 0, amv / 127.0, 1.0))
        kq = jnp.clip(jnp.round(kp.astype(jnp.float32) / sk[..., None]),
                      -127, 127).astype(jnp.int8)
        vq = jnp.clip(jnp.round(vp.astype(jnp.float32) / sv[..., None]),
                      -127, 127).astype(jnp.int8)
        kp, vp = kq, vq
        kwargs = dict(k_scales=sk, v_scales=sv)
    if nq == 1:
        got = paged_attention_multipage(q[:, 0], kp, vp, lens, pidx, **kwargs)
        want = paged_attention_reference(q[:, 0], kp, vp, lens, pidx, **kwargs)
    else:
        got = paged_attention_multiquery(q, kp, vp, lens, pidx, **kwargs)
        want = paged_attention_multiquery_reference(
            q, kp, vp, lens, pidx, **kwargs)
    if tol is None:
        tol = 5e-2 if quantized else 2e-2
    check(tag, got, want, tol=tol)


B = 64
rng = np.random.RandomState(7)
mixed = rng.randint(1, 4 * PS, B)
mixed[::7] = 0  # inactive rows sprinkled through
first_last_dead = mixed.copy()
first_last_dead[0] = 0
first_last_dead[-1] = 0

short_mixed = rng.randint(4, 4 * PS - 4, 32)
short_mixed[::5] = rng.randint(4, 24, len(short_mixed[::5]))  # short seqs

for quantized in (False, True):
    tag = "int8" if quantized else "bf16"
    run_case(f"{tag} single-block uniform", B, 4, np.full(B, 270), quantized)
    run_case(f"{tag} single-block mixed+dead rows", B, 4, mixed, quantized,
             seed=1)
    run_case(f"{tag} single-block dead first/last", B, 4, first_last_dead,
             quantized, seed=2)
    run_case(f"{tag} single-block width-1 tables", B, 1,
             rng.randint(1, PS, B), quantized, seed=3)
    run_case(f"{tag} multi-block ctx", 16, 12,
             rng.randint(1, 12 * PS, 16), quantized, seed=4)
    run_case(f"{tag} batch=1 (no cross-seq path)", 1, 4, [300], quantized,
             seed=5)
    run_case(f"{tag} multiquery nq=4 single-block", 32, 4, short_mixed,
             quantized, nq=4, seed=6)
run_case("int8 adversarial 100x scale spread", 32, 4, short_mixed, True,
         nq=4, seed=6, adversarial_scales=True, tol=2e-1)

print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}",
      file=sys.stderr)
sys.exit(1 if failures else 0)
