"""Paged attention + page allocator + continuous-batching scheduler tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dots_ocr_tpu.engine.kv_cache import OutOfPages, PageAllocator, PagedKV
from dots_ocr_tpu.models.config import DotsOCRConfig
from dots_ocr_tpu.ops.attention import decode_attention_reference
from dots_ocr_tpu.ops.paged_attention import paged_attention, paged_attention_reference


# ---------------------------------------------------------------------------
# Allocator
# ---------------------------------------------------------------------------


class TestPageAllocator:
    def _alloc(self, pages=8, size=4, max_per=8):
        return PageAllocator(num_pages=pages, page_size=size, max_pages_per_seq=max_per)

    def test_allocate_and_free(self):
        a = self._alloc()
        assert a.free_pages == 7  # page 0 reserved
        pages = a.allocate(1, 10)  # 3 pages of 4
        assert len(pages) == 3
        assert 0 not in pages
        assert a.free_pages == 4
        a.free(1)
        assert a.free_pages == 7

    def test_extend_appends_pages(self):
        a = self._alloc()
        a.allocate(1, 4)
        assert len(a.page_table(1)) == 1
        a.extend(1, 5)
        assert len(a.page_table(1)) == 2
        a.extend(1, 8)
        assert len(a.page_table(1)) == 2

    def test_out_of_pages(self):
        a = self._alloc(pages=3, size=4)
        a.allocate(1, 8)  # uses both free pages
        with pytest.raises(OutOfPages):
            a.allocate(2, 4)

    def test_slot_mapping(self):
        a = self._alloc()
        a.allocate(1, 10)
        table = a.page_table(1)
        slots = a.slot_mapping(1, 0, 10)
        assert slots[0] == table[0] * 4
        assert slots[4] == table[1] * 4
        assert slots[9] == table[2] * 4 + 1

    def test_padded_table_null_page(self):
        a = self._alloc()
        a.allocate(1, 4)
        padded = a.padded_table(1)
        assert padded.shape == (8,)
        assert (padded[1:] == 0).all()


# ---------------------------------------------------------------------------
# Paged attention kernel vs references
# ---------------------------------------------------------------------------


def _setup_paged(rng_key, batch, kv_heads, heads, d, page_size, max_pages, lengths):
    """Build a paged cache + equivalent contiguous cache."""
    rng = np.random.RandomState(rng_key)
    total_pages = batch * max_pages + 1
    k_pages = np.zeros((kv_heads, total_pages, page_size, d), np.float32)
    v_pages = np.zeros_like(k_pages)
    s_max = max_pages * page_size
    k_contig = np.zeros((batch, s_max, kv_heads, d), np.float32)
    v_contig = np.zeros_like(k_contig)
    page_indices = np.zeros((batch, max_pages), np.int32)

    # Assign shuffled physical pages per sequence.
    perm = rng.permutation(total_pages - 1) + 1
    next_page = 0
    for b in range(batch):
        n_pages = -(-lengths[b] // page_size)
        for p in range(n_pages):
            phys = perm[next_page]
            next_page += 1
            page_indices[b, p] = phys
            n_valid = min(page_size, lengths[b] - p * page_size)
            chunk_k = rng.randn(n_valid, kv_heads, d).astype(np.float32)
            chunk_v = rng.randn(n_valid, kv_heads, d).astype(np.float32)
            k_pages[:, phys, :n_valid] = chunk_k.transpose(1, 0, 2)
            v_pages[:, phys, :n_valid] = chunk_v.transpose(1, 0, 2)
            k_contig[b, p * page_size : p * page_size + n_valid] = chunk_k
            v_contig[b, p * page_size : p * page_size + n_valid] = chunk_v

    q = rng.randn(batch, heads, d).astype(np.float32)
    return (
        jnp.asarray(q),
        jnp.asarray(k_pages),
        jnp.asarray(v_pages),
        jnp.asarray(np.asarray(lengths, np.int32)),
        jnp.asarray(page_indices),
        jnp.asarray(k_contig),
        jnp.asarray(v_contig),
    )


def test_paged_reference_matches_contiguous():
    lengths = [10, 5, 16, 1]
    q, kp, vp, lens, pidx, kc, vc = _setup_paged(0, 4, 2, 8, 32, 4, 4, lengths)
    out = paged_attention_reference(q, kp, vp, lens, pidx)
    ref = decode_attention_reference(q, kc, vc, lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_paged_kernel_matches_reference():
    lengths = [10, 5, 16, 1]
    q, kp, vp, lens, pidx, kc, vc = _setup_paged(1, 4, 2, 8, 32, 4, 4, lengths)
    out = paged_attention(q, kp, vp, lens, pidx, interpret=True)
    ref = paged_attention_reference(q, kp, vp, lens, pidx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_multipage_kernel_matches_reference():
    from dots_ocr_tpu.ops.paged_attention import paged_attention_multipage

    lengths = [10, 5, 16, 1]
    q, kp, vp, lens, pidx, kc, vc = _setup_paged(7, 4, 2, 8, 32, 4, 4, lengths)
    out = paged_attention_multipage(q, kp, vp, lens, pidx, interpret=True)
    ref = paged_attention_reference(q, kp, vp, lens, pidx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_multipage_kernel_zero_length_and_partial_pages():
    from dots_ocr_tpu.ops.paged_attention import paged_attention_multipage

    lengths = [8, 0, 3, 0]
    q, kp, vp, lens, pidx, kc, vc = _setup_paged(8, 4, 2, 4, 32, 4, 4, lengths)
    out = np.asarray(paged_attention_multipage(q, kp, vp, lens, pidx, interpret=True))
    assert not np.isnan(out).any()
    np.testing.assert_array_equal(out[1], 0.0)
    np.testing.assert_array_equal(out[3], 0.0)
    ref = np.asarray(paged_attention_reference(q, kp, vp, lens, pidx))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_multipage_kernel_partial_blocks():
    """pages_per_block not dividing the page count: the clamped duplicate
    pages in the last block must be fully masked."""
    from dots_ocr_tpu.ops.paged_attention import paged_attention_multipage

    lengths = [100, 37, 128, 5]  # 4, 2, 4, 1 pages of 32
    q, kp, vp, lens, pidx, kc, vc = _setup_paged(11, 4, 2, 8, 32, 32, 4, lengths)
    ref = paged_attention_reference(q, kp, vp, lens, pidx)
    for fpb in (1, 3, 4):
        out = paged_attention_multipage(
            q, kp, vp, lens, pidx, pages_per_block=fpb, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5,
            err_msg=f"fpb={fpb}",
        )


def test_multipage_kernel_quantized():
    from dots_ocr_tpu.engine.kv_cache import quantize_kv
    from dots_ocr_tpu.ops.paged_attention import paged_attention_multipage

    lengths = [10, 5, 16, 1]
    q, kp, vp, lens, pidx, kc, vc = _setup_paged(9, 4, 2, 8, 32, 4, 4, lengths)
    qk, sk = quantize_kv(kp)
    qv, sv = quantize_kv(vp)
    ref = paged_attention_reference(q, qk, qv, lens, pidx, k_scales=sk, v_scales=sv)
    out = paged_attention_multipage(
        q, qk, qv, lens, pidx, k_scales=sk, v_scales=sv, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_paged_kernel_zero_length_slot():
    lengths = [8, 0, 3, 0]
    q, kp, vp, lens, pidx, kc, vc = _setup_paged(2, 4, 2, 4, 32, 4, 4, lengths)
    out = np.asarray(paged_attention(q, kp, vp, lens, pidx, interpret=True))
    assert not np.isnan(out).any()
    np.testing.assert_array_equal(out[1], 0.0)
    np.testing.assert_array_equal(out[3], 0.0)


# ---------------------------------------------------------------------------
# int8-quantized KV cache
# ---------------------------------------------------------------------------


class TestQuantizedKV:
    def test_quantize_roundtrip(self):
        from dots_ocr_tpu.engine.kv_cache import quantize_kv

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(8, 2, 32).astype(np.float32))
        q, scale = quantize_kv(x)
        assert q.dtype == jnp.int8 and scale.shape == (8, 2)
        recon = np.asarray(q, np.float32) * np.asarray(scale)[..., None]
        err = np.abs(recon - np.asarray(x)).max() / np.abs(np.asarray(x)).max()
        assert err < 0.01  # int8 symmetric: <1% of range

    def test_quantize_zero_vector(self):
        from dots_ocr_tpu.engine.kv_cache import quantize_kv

        q, scale = quantize_kv(jnp.zeros((4, 2, 8)))
        assert np.all(np.asarray(q) == 0)
        assert np.all(np.asarray(scale) == 1.0)

    def test_quantized_attention_close_to_fp(self):
        lengths = [10, 5, 16, 1]
        q, kp, vp, lens, pidx, kc, vc = _setup_paged(5, 4, 2, 8, 32, 4, 4, lengths)
        from dots_ocr_tpu.engine.kv_cache import quantize_kv

        qk, sk = quantize_kv(kp)  # [KV, P, ps, d] -> scales [KV, P, ps]
        qv, sv = quantize_kv(vp)
        ref = paged_attention_reference(q, kp, vp, lens, pidx)
        out = paged_attention_reference(
            q, qk, qv, lens, pidx, k_scales=sk, v_scales=sv
        )
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=0.05, atol=0.05,
        )

    def test_quantized_kernel_matches_quantized_reference(self):
        lengths = [10, 5, 16, 1]
        q, kp, vp, lens, pidx, kc, vc = _setup_paged(6, 4, 2, 8, 32, 4, 4, lengths)
        from dots_ocr_tpu.engine.kv_cache import quantize_kv

        qk, sk = quantize_kv(kp)
        qv, sv = quantize_kv(vp)
        ref = paged_attention_reference(
            q, qk, qv, lens, pidx, k_scales=sk, v_scales=sv
        )
        out = paged_attention(
            q, qk, qv, lens, pidx, k_scales=sk, v_scales=sv, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2,
        )

    def test_scheduler_int8_end_to_end(self):
        from dots_ocr_tpu.engine.scheduler import (
            ContinuousBatchingEngine,
            SchedulerConfig,
        )
        from dots_ocr_tpu.models.init import init_params

        cfg = DotsOCRConfig.tiny()
        params = init_params(jax.random.PRNGKey(0), cfg)

        def build(dtype):
            return ContinuousBatchingEngine(
                params, cfg,
                sched=SchedulerConfig(
                    num_pages=64, page_size=8, max_slots=2, max_pages_per_seq=16,
                    prompt_bucket_step=32, vision_bucket_step=16,
                    steps_per_sync=4, kv_cache_dtype=dtype,
                ),
                default_max_new_tokens=6,
            )

        a = build("bf16").generate_one("hello int8", temperature=0.0, max_new_tokens=6)
        b = build("int8").generate_one("hello int8", temperature=0.0, max_new_tokens=6)
        # Greedy decode through a quantized cache stays on the same path for
        # a tiny random model (logit gaps >> int8 error).
        assert isinstance(b, str)
        assert a == b


# ---------------------------------------------------------------------------
# Scheduler end-to-end (tiny model, CPU)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def cb_engine():
    from dots_ocr_tpu.engine.scheduler import ContinuousBatchingEngine, SchedulerConfig
    from dots_ocr_tpu.models.init import init_params

    cfg = DotsOCRConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    return ContinuousBatchingEngine(
        params,
        cfg,
        sched=SchedulerConfig(
            num_pages=64,
            page_size=8,
            max_slots=4,
            max_pages_per_seq=16,
            prompt_bucket_step=32,
            vision_bucket_step=16,
        ),
        default_max_new_tokens=8,
    )


def test_scheduler_single_request(cb_engine):
    out = cb_engine.generate_one("hello world", temperature=0.0, max_new_tokens=6)
    assert isinstance(out, str)
    assert cb_engine.metrics["prefills"] >= 1
    # all pages returned after completion
    assert cb_engine.allocator.free_pages == 63


def test_scheduler_matches_sync_engine_greedy(cb_engine):
    """Continuous batching must produce the same greedy tokens as the
    simple generate() engine (same weights, same prompt)."""
    from dots_ocr_tpu.engine.engine import InferenceEngine

    sync = InferenceEngine(
        cb_engine.params,
        cb_engine.config,
        prompt_bucket_step=32,
        vision_bucket_step=16,
    )
    a = sync.generate_one("abcdef", temperature=0.0, max_new_tokens=6)
    b = cb_engine.generate_one("abcdef", temperature=0.0, max_new_tokens=6)
    assert a == b


def test_warmup_decode_precompiles_and_is_inert(cb_engine):
    """warmup_decode on an idle engine compiles every width bucket without
    changing subsequent greedy output or leaking pages/slots."""
    before = cb_engine.generate_one("warmup probe", temperature=0.0, max_new_tokens=6)
    n = cb_engine.warmup_decode(nucleus_variants=(False,))
    # widths 1,2,4,8,16 for max_pages_per_seq=16, x2 chunk depths
    # (steps_per_sync + max_steps_per_sync)
    assert n == 10
    assert cb_engine.allocator.free_pages == 63
    assert all(r is None for r in cb_engine._slot_req)
    after = cb_engine.generate_one("warmup probe", temperature=0.0, max_new_tokens=6)
    assert before == after


def test_event_free_chunks_reuse_device_inputs():
    """A long single-request decode should upload chunk inputs only on
    event chunks (admission / finish / page growth), not every chunk —
    and the zero-upload device-carry chaining must not change greedy
    output vs a fresh engine."""
    from dots_ocr_tpu.engine.scheduler import ContinuousBatchingEngine, SchedulerConfig
    from dots_ocr_tpu.models.init import init_params

    cfg = DotsOCRConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)

    def make():
        return ContinuousBatchingEngine(
            params, cfg,
            sched=SchedulerConfig(
                num_pages=16, page_size=64, max_slots=2, max_pages_per_seq=4,
                prompt_bucket_step=32, vision_bucket_step=16, steps_per_sync=4,
            ),
            default_max_new_tokens=40,
        )

    eng = make()
    a = eng.generate_one("steady state", temperature=0.0, max_new_tokens=40)
    steps = eng.metrics["steps"]
    rebuilds = eng.metrics["chunk_input_rebuilds"]
    # 40 tokens at chunk=4 -> ~10 chunks; page growth every 64 tokens, so
    # only the post-admission chunk (+ maybe one boundary) rebuilds
    assert steps >= 8 and 0 < rebuilds <= 2
    assert a == make().generate_one("steady state", temperature=0.0, max_new_tokens=40)


def test_warmup_decode_max_len_bounds_widths(cb_engine):
    # 3 tokens + page_size 8 -> 1 page -> single width (x2 chunk depths)
    assert cb_engine.warmup_decode(max_len=3, nucleus_variants=(False,)) == 2


def test_incremental_warmup_ticks_drain_and_yield_to_traffic(cb_engine):
    """queue_warmup + warm_tick compiles the plan one thunk per tick
    (first thunk SUBMITS vision+text warm requests that drain through the
    normal step loop), refuses to run while requests are live, and leaves
    subsequent greedy output unchanged."""
    before = cb_engine.generate_one("inc warm probe", temperature=0.0,
                                    max_new_tokens=6)
    n = cb_engine.queue_warmup(nucleus_variants=(False,))
    assert n == cb_engine.warm_pending > 1
    # A live request blocks warm ticks.
    rid = cb_engine.submit("busy", max_new_tokens=4, temperature=0.0)
    assert cb_engine.warm_tick() is False
    while cb_engine.has_work():
        cb_engine.step()
    cb_engine.take_finished(rid)
    ticks = 0
    while cb_engine.warm_pending:
        if cb_engine.warm_tick():
            ticks += 1
        # The warm-request thunk leaves live work; drain like the server
        # loop does before the next tick.
        while cb_engine.has_work():
            cb_engine.step()
    assert ticks == n and cb_engine.warm_pending == 0
    assert cb_engine.warm_tick() is False  # drained queue is inert
    for wrid in list(cb_engine._finished):
        cb_engine.take_finished(wrid)
    after = cb_engine.generate_one("inc warm probe", temperature=0.0,
                                   max_new_tokens=6)
    assert before == after


def test_scheduler_concurrent_requests(cb_engine):
    outs = cb_engine.generate_batch(
        ["first prompt", "second one", "third prompt here", "fourth", "fifth", "sixth"],
        [[] for _ in range(6)],
        temperature=0.0,
        max_new_tokens=5,
    )
    assert len(outs) == 6
    # more requests than slots forced queueing; everything still completed
    assert cb_engine.allocator.free_pages == 63


def test_scheduler_with_image(cb_engine):
    from PIL import Image

    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8))
    out = cb_engine.generate_one(
        "describe", images=[img], temperature=0.0, max_new_tokens=4
    )
    assert isinstance(out, str)


def test_scheduler_image_matches_sync_engine(cb_engine):
    from PIL import Image

    from dots_ocr_tpu.engine.engine import InferenceEngine

    rng = np.random.RandomState(3)
    img = Image.fromarray(rng.randint(0, 255, (64, 80, 3), np.uint8))
    sync = InferenceEngine(
        cb_engine.params, cb_engine.config,
        prompt_bucket_step=32, vision_bucket_step=16,
    )
    a = sync.generate_one("parse", images=[img], temperature=0.0, max_new_tokens=5)
    b = cb_engine.generate_one("parse", images=[img], temperature=0.0, max_new_tokens=5)
    assert a == b


def test_scheduler_preemption_under_page_pressure():
    from dots_ocr_tpu.engine.scheduler import ContinuousBatchingEngine, SchedulerConfig
    from dots_ocr_tpu.models.init import init_params

    cfg = DotsOCRConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    engine = ContinuousBatchingEngine(
        params,
        cfg,
        sched=SchedulerConfig(
            num_pages=20,  # tight: forces preemption under concurrent decode
            page_size=4,
            max_slots=4,
            max_pages_per_seq=16,
            prompt_bucket_step=32,
            vision_bucket_step=16,
            admit_free_page_fraction=0.0,
        ),
        default_max_new_tokens=16,
    )
    prompts = ["aaaaaaaaaaaaaaaa", "bbbbbbbbbbbbbbbb", "cccccccccccccccc"]
    outs = engine.generate_batch(
        prompts, [[], [], []], temperature=0.0, max_new_tokens=16
    )
    assert len(outs) == 3
    assert engine.allocator.free_pages == 19  # everything freed
    assert engine.metrics["preemptions"] > 0  # pressure actually happened

    # Preemption must be output-transparent: under greedy decoding a
    # preempted+replayed request yields exactly what an unpressured engine
    # yields (pre-preemption tokens are kept, the replay continues them).
    roomy = ContinuousBatchingEngine(
        params,
        cfg,
        sched=SchedulerConfig(
            num_pages=256, page_size=4, max_slots=4, max_pages_per_seq=64,
            prompt_bucket_step=32, vision_bucket_step=16,
            admit_free_page_fraction=0.0,
        ),
        default_max_new_tokens=16,
    )
    expected = roomy.generate_batch(
        prompts, [[], [], []], temperature=0.0, max_new_tokens=16
    )
    assert outs == expected


def test_adaptive_deep_chunks_match_shallow():
    """With max_steps_per_sync > steps_per_sync, long-budget decodes run
    deeper chunks (fewer dispatches) and produce identical greedy output."""
    from dots_ocr_tpu.engine.scheduler import ContinuousBatchingEngine, SchedulerConfig
    from dots_ocr_tpu.models.init import init_params

    cfg = DotsOCRConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)

    def build(deep):
        return ContinuousBatchingEngine(
            params, cfg,
            sched=SchedulerConfig(
                num_pages=64, page_size=8, max_slots=2, max_pages_per_seq=16,
                prompt_bucket_step=32, vision_bucket_step=16,
                steps_per_sync=2, max_steps_per_sync=deep,
                repetition_min_repeats=0,
            ),
        )

    shallow = build(2)
    a = shallow.generate_one("deep chunk probe", temperature=0.0, max_new_tokens=24)
    deep = build(8)
    b = deep.generate_one("deep chunk probe", temperature=0.0, max_new_tokens=24)
    assert a == b
    assert deep.metrics["steps"] < shallow.metrics["steps"]


def test_deep_chunks_stay_shallow_with_stop_strings():
    """Stop strings need per-chunk host checks: the deepening gate must not
    engage, and stop semantics stay exact."""
    from dots_ocr_tpu.engine.scheduler import ContinuousBatchingEngine, SchedulerConfig
    from dots_ocr_tpu.models.init import init_params

    cfg = DotsOCRConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = ContinuousBatchingEngine(
        params, cfg,
        sched=SchedulerConfig(
            num_pages=64, page_size=8, max_slots=2, max_pages_per_seq=16,
            prompt_bucket_step=32, vision_bucket_step=16,
            steps_per_sync=2, max_steps_per_sync=16,
            repetition_min_repeats=0,
        ),
    )
    ref = eng.generate_one("stop probe", temperature=0.0, max_new_tokens=24)
    if len(ref) < 4:
        return  # random tiny model emitted EOS immediately; nothing to stop on
    needle = ref[2:4]
    out = eng.generate_one(
        "stop probe", temperature=0.0, max_new_tokens=24, stop=[needle]
    )
    assert needle not in out
    assert out == ref.split(needle)[0]


def test_static_table_width_gating():
    """The production decode path (v2 multi-page kernel: head_dim
    128-aligned) pins the page-table width at max_pages_per_seq — one
    compiled program per (depth, nucleus, spec) instead of one per
    power-of-two width bucket. Fallback paths keep bucketing."""
    from dots_ocr_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        SchedulerConfig,
    )
    from dots_ocr_tpu.models.init import init_params

    sched = SchedulerConfig(
        num_pages=16, page_size=64, max_slots=2, max_pages_per_seq=4,
        prompt_bucket_step=32, vision_bucket_step=16,
    )
    tiny = DotsOCRConfig.tiny()  # head_dim 16 -> always bucketed
    tiny_params = init_params(jax.random.PRNGKey(0), tiny)
    e1 = ContinuousBatchingEngine(tiny_params, tiny, sched=sched,
                                  attn_impl="flash")
    assert e1.decode_impl == "paged" and not e1._static_width
    e2 = ContinuousBatchingEngine(tiny_params, tiny, sched=sched)  # cpu auto
    assert e2.decode_impl == "reference" and not e2._static_width
    # Flagship (head_dim 128) on the paged impl -> static width; int8 KV
    # with non-128-aligned pages falls back to v1 -> bucketed again.
    flag = DotsOCRConfig.flagship()
    assert flag.decoder.head_dim % 128 == 0
    e3 = ContinuousBatchingEngine(
        init_params(jax.random.PRNGKey(0), tiny), tiny,
        sched=sched, attn_impl="flash",
    )
    e3.config = flag  # gating uses config.decoder.head_dim at __init__ only
    # Re-evaluate the gate exactly as __init__ does:
    static = (
        e3.decode_impl == "paged"
        and flag.decoder.head_dim % 128 == 0
        and not (sched.kv_cache_dtype == "int8" and sched.page_size % 128)
    )
    assert static


def test_prepared_submit_equals_inline(cb_engine):
    """submit(prepared=engine.prepare(...)) — the preprocessing-pool path
    the server's EngineWorker uses — must produce identical output to the
    inline submit, including with images."""
    from PIL import Image

    rng = np.random.RandomState(3)
    img = Image.fromarray(rng.randint(0, 255, (64, 80, 3), np.uint8))
    rid_a = cb_engine.submit("prep parity", images=[img],
                             temperature=0.0, max_new_tokens=6)
    cb_engine.run()
    a = cb_engine.request_text(rid_a)
    prepared = cb_engine.prepare("prep parity", [img])
    rid_b = cb_engine.submit("prep parity", temperature=0.0,
                             max_new_tokens=6, prepared=prepared)
    cb_engine.run()
    assert cb_engine.request_text(rid_b) == a
