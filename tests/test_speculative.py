"""n-gram speculative decoding: device drafting + multi-token verify.

Greedy speculation must be EXACT (the accepted prefix reproduces what
sequential greedy decode would emit, and the corrective token is the
argmax at the first mismatch), so spec engines must produce byte-identical
output to non-spec engines at temperature 0. The multi-query verify kernel
is covered in tests/test_paged.py-style unit tests here as well.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.models.init import init_params


@pytest.fixture(scope="module")
def setup():
    cfg = DotsOCRConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def build(setup, spec_k=0, **overrides):
    from dots_ocr_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        SchedulerConfig,
    )

    cfg, params = setup
    kw = dict(
        num_pages=64,
        page_size=8,
        max_slots=4,
        max_pages_per_seq=16,
        prompt_bucket_step=32,
        vision_bucket_step=16,
        steps_per_sync=2,
        max_steps_per_sync=2,  # isolate speculation from deep chunks
        speculate_k=spec_k,
        repetition_min_repeats=0,
    )
    kw.update(overrides)
    return ContinuousBatchingEngine(
        params, cfg, sched=SchedulerConfig(**kw), default_max_new_tokens=8
    )


def test_spec_greedy_identical(setup):
    base = build(setup)
    want = base.generate_one("speculate on this", temperature=0.0,
                             max_new_tokens=40)
    for k in (2, 4):
        eng = build(setup, spec_k=k)
        got = eng.generate_one("speculate on this", temperature=0.0,
                               max_new_tokens=40)
        assert got == want, f"spec_k={k}"
        assert eng.metrics.get("spec_chunks", 0) >= 1


def test_spec_accepts_degenerate_loop(setup):
    """A random tiny model greedy-loops quickly; the repeat-current fallback
    and n-gram matches must then accept multiple tokens per iteration —
    strictly fewer decode dispatches than sequential decode."""
    base = build(setup)
    a = base.generate_one("loop probe xyz", temperature=0.0, max_new_tokens=48)
    base_steps = base.metrics["steps"]
    eng = build(setup, spec_k=4)
    b = eng.generate_one("loop probe xyz", temperature=0.0, max_new_tokens=48)
    assert a == b
    assert eng.metrics["steps"] < base_steps


def test_spec_batch_mixed_lengths(setup):
    base = build(setup)
    prompts = ["alpha doc", "a much longer beta document prompt here", "g"]
    want = base.generate_batch(prompts, temperature=0.0, max_new_tokens=24)
    eng = build(setup, spec_k=3)
    got = eng.generate_batch(prompts, temperature=0.0, max_new_tokens=24)
    assert got == want


def test_spec_int8_cache_greedy(setup):
    a = build(setup, kv_cache_dtype="int8").generate_one(
        "int8 spec", temperature=0.0, max_new_tokens=24
    )
    b = build(setup, spec_k=4, kv_cache_dtype="int8").generate_one(
        "int8 spec", temperature=0.0, max_new_tokens=24
    )
    assert a == b


def test_spec_sampled_and_nucleus_rows_speculate(setup):
    eng = build(setup, spec_k=4)
    out = eng.generate_one("sampled spec", temperature=0.8, max_new_tokens=16,
                           seed=7)
    assert isinstance(out, str)
    assert eng.metrics.get("spec_chunks", 0) >= 1
    # top_p < 1 rows run the nucleus-exact verify (no fallback).
    before = eng.metrics.get("spec_chunks", 0)
    out = eng.generate_one("nucleus spec", temperature=0.8, top_p=0.9,
                           max_new_tokens=8, seed=3)
    assert isinstance(out, str)
    assert eng.metrics.get("spec_chunks", 0) > before


def test_spec_nucleus_collapse_matches_greedy(setup):
    """With top_p -> 0 the nucleus keeps only the argmax, so sampled
    nucleus speculation must reproduce greedy output exactly — this drives
    the nucleus accept path AND the kept-set corrective deterministically."""
    want = build(setup).generate_one("nucleus collapse probe",
                                     temperature=0.0, max_new_tokens=32)
    eng = build(setup, spec_k=3)
    got = eng.generate_one("nucleus collapse probe", temperature=0.7,
                           top_p=1e-6, max_new_tokens=32, seed=11)
    assert got == want
    assert eng.metrics.get("spec_chunks", 0) >= 1


def test_spec_eos_and_stop_semantics(setup):
    """EOS inside an accepted run truncates exactly; stop strings still
    apply (host-side) with speculation on."""
    base = build(setup)
    ref = base.generate_one("stop spec probe", temperature=0.0,
                            max_new_tokens=40)
    eng = build(setup, spec_k=4)
    assert eng.generate_one("stop spec probe", temperature=0.0,
                            max_new_tokens=40) == ref
    if len(ref) >= 4:
        needle = ref[1:3]
        got = eng.generate_one("stop spec probe", temperature=0.0,
                               max_new_tokens=40, stop=[needle])
        assert needle not in got
        assert got == ref.split(needle)[0]


def test_multiquery_attention_matches_reference():
    from dots_ocr_tpu.ops.paged_attention import (
        paged_attention_multiquery,
        paged_attention_multiquery_reference,
    )

    rng = np.random.RandomState(0)
    kv, ps, d, B, H, mp, nq = 2, 8, 32, 4, 8, 6, 4
    npages = B * mp + 1
    kp = jnp.asarray(rng.randn(kv, npages, ps, d), jnp.float32)
    vp = jnp.asarray(rng.randn(kv, npages, ps, d), jnp.float32)
    tables = jnp.asarray(
        rng.permutation(npages - 1)[: B * mp].reshape(B, mp) + 1, jnp.int32
    ) - 1
    lengths = jnp.asarray([10, 0, 30, 45], jnp.int32)
    q = jnp.asarray(rng.randn(B, nq, H, d), jnp.float32)
    ref = np.asarray(
        paged_attention_multiquery_reference(q, kp, vp, lengths, tables)
    )
    out = np.asarray(
        paged_attention_multiquery(q, kp, vp, lengths, tables, interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
    assert np.abs(out[1]).max() == 0  # zero-length row outputs zeros


def test_multiquery_int8_matches_reference():
    from dots_ocr_tpu.engine.kv_cache import quantize_kv
    from dots_ocr_tpu.ops.paged_attention import (
        paged_attention_multiquery,
        paged_attention_multiquery_reference,
    )

    rng = np.random.RandomState(1)
    kv, ps, d, B, H, mp, nq = 2, 8, 32, 3, 8, 4, 3
    npages = B * mp + 1
    kp = jnp.asarray(rng.randn(kv, npages, ps, d), jnp.float32)
    vp = jnp.asarray(rng.randn(kv, npages, ps, d), jnp.float32)
    qk, sk = quantize_kv(kp)
    qv, sv = quantize_kv(vp)
    tables = jnp.asarray(
        rng.permutation(npages - 1)[: B * mp].reshape(B, mp) + 1, jnp.int32
    ) - 1
    # NB: lengths + nq - 1 must stay within the tables' coverage (the
    # scheduler reserves pages for every draft position before dispatch).
    lengths = jnp.asarray([9, 20, 30], jnp.int32)
    q = jnp.asarray(rng.randn(B, nq, H, d), jnp.float32)
    ref = np.asarray(paged_attention_multiquery_reference(
        q, qk, qv, lengths, tables, k_scales=sk, v_scales=sv), np.float32)
    out = np.asarray(paged_attention_multiquery(
        q, qk, qv, lengths, tables, k_scales=sk, v_scales=sv, interpret=True),
        np.float32)
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2)


def test_spec_with_preemption(setup):
    """Speculation + page-pool pressure: preemption clears device carry
    (including the spec history buffer); output must match the unpressured
    engine exactly at temperature 0."""
    want = build(setup, spec_k=3).generate_batch(
        ["preempt alpha doc", "preempt beta doc", "preempt gamma"],
        temperature=0.0, max_new_tokens=32)
    eng = build(setup, spec_k=3, num_pages=20)  # tight pool forces preemption
    got = eng.generate_batch(
        ["preempt alpha doc", "preempt beta doc", "preempt gamma"],
        temperature=0.0, max_new_tokens=32)
    assert got == want
    assert eng.metrics["preemptions"] >= 1  # the pressure actually bit


def test_spec_auto_disable_and_reprobe(setup):
    """With the break-even floor set impossibly high, speculation must
    auto-disable after 3 spec chunks (output still exact) and re-probe
    after the engine drains idle."""
    want = build(setup).generate_one("auto disable probe", temperature=0.0,
                                     max_new_tokens=40)
    eng = build(setup, spec_k=3, spec_min_tokens_per_iter=100.0)
    got = eng.generate_one("auto disable probe", temperature=0.0,
                           max_new_tokens=40)
    assert got == want
    assert eng.metrics.get("spec_auto_disabled", 0) == 1
    assert not eng._spec_enabled or not eng.has_work()
    # generate_one drains the engine -> the gate re-probes.
    assert eng._spec_enabled
    before = eng.metrics.get("spec_chunks", 0)
    eng.generate_one("fresh probe", temperature=0.0, max_new_tokens=8)
    assert eng.metrics.get("spec_chunks", 0) > before


def test_spec_stays_enabled_at_high_acceptance(setup):
    """Period-1 greedy loops accept every draft: the default floor must
    never disable speculation there."""
    eng = build(setup, spec_k=3)
    eng.generate_one("high acceptance", temperature=0.0, max_new_tokens=48)
    assert eng.metrics.get("spec_auto_disabled", 0) == 0
    assert eng._spec_enabled


def test_adaptive_cutoff_pins_to_measured_breakeven(setup):
    """The auto-disable gate must fire EXACTLY below the configured
    break-even (which tools/bench_spec.py --acceptance-sweep ties to the
    measured verify/decode cost ratio ~1.64 — SchedulerConfig default 1.5)
    and never above it (VERDICT r2 item 3)."""
    eng = build(setup, spec_k=3)
    floor = eng.sched.spec_min_tokens_per_iter
    assert floor == 1.5  # shipping default, from the measured cost ratio

    # Sustained emission ABOVE the break-even: gate must stay open.
    for _ in range(10):
        eng._update_spec_gate(
            emitted=int((floor + 0.2) * 4 * 8), chunk=4, n_active=8
        )
    assert eng._spec_enabled

    # Sustained emission just BELOW: gate must close after 3 low chunks
    # (EWMA decay from the high plateau takes a few extra chunks).
    low = int((floor - 0.3) * 4 * 8)
    fired_after = None
    for i in range(12):
        eng._update_spec_gate(emitted=low, chunk=4, n_active=8)
        if not eng._spec_enabled:
            fired_after = i + 1
            break
    assert fired_after is not None, "gate never fired below break-even"
    assert eng.metrics.get("spec_auto_disabled", 0) == 1

    # Fresh engine marginally above the break-even: no fire. (Exactly AT
    # the floor is intentionally unspecified: the 0.7/0.3 EWMA constants
    # are not binary-exact, so 1.5 accumulates to 1.4999999999999998 —
    # either behavior at the knife edge is fine.)
    eng2 = build(setup, spec_k=3)
    for _ in range(10):
        eng2._update_spec_gate(
            emitted=int((floor + 0.05) * 4 * 8), chunk=4, n_active=8
        )
    assert eng2._spec_enabled


def test_cutoff_on_mixed_near_breakeven_stream(setup):
    """VERDICT r4 item 5: pin the adaptive cutoff on a REALISTIC
    near-break-even mix, not an all-accept/all-reject extreme.

    One greedy slot (period-1 loop: drafts accept ~fully, ~k+1
    tokens/slot-iter) co-batched with three temp-1.0 slots (uniform-ish
    151-way tiny softmax: drafts accept ~never, ~1 token/slot-iter) gives
    an aggregate ~(4 + 3)/4 ~= 1.75 tokens/slot-iter at k=3 — an SVG-like
    barely-above-break-even stream. The SAME stream must keep speculation
    enabled under a floor below the mix's rate and disable it under a
    floor above."""

    def run(floor, greedy_budget, sampled_budget):
        eng = build(setup, spec_k=3, spec_min_tokens_per_iter=floor)
        for i in range(4):
            eng.submit(
                f"near breakeven stream {i}",
                temperature=0.0 if i == 0 else 1.0,
                max_new_tokens=greedy_budget if i == 0 else sampled_budget,
            )
        while eng.has_work():
            eng.step()
        return eng

    # Sampled rows finish FIRST here, so the stream never degrades into a
    # pure all-reject tail: mixed phase ~1.75 tok/slot-iter, then a pure
    # greedy tail at ~k+1. A floor below the mixed rate must never trip.
    eng_lo = run(floor=1.05, greedy_budget=64, sampled_budget=24)
    assert eng_lo.metrics.get("spec_auto_disabled", 0) == 0, (
        "floor below the mix's emitted/slot-iter must keep speculation on"
    )
    assert eng_lo.metrics.get("spec_chunks", 0) >= 3

    # Equal budgets: once the greedy row drains, the remaining all-reject
    # rows sit at ~1 tok/slot-iter — the gate MUST trip (this is exactly
    # the SVG-at-0.15-acceptance shape from tools/spec_realism.py).
    eng_hi = run(floor=1.5, greedy_budget=16, sampled_budget=64)
    assert eng_hi.metrics.get("spec_auto_disabled", 0) == 1, (
        "an all-reject tail below the shipped floor must trip the cutoff"
    )
    # After tripping, the remaining chunks ran plain — every request still
    # completed its exact budget.
    budgets = sorted(
        len(r.output_ids) for r in eng_hi._finished.values()
    )
    assert budgets == [16, 64, 64, 64]
