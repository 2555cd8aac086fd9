"""Host drafter simulator pinned against the real device spec program.

engine/spec_sim.py claims to replay scheduler.spec_decode_program's
greedy pipeline exactly. These tests prove it: a bigram-table model
(deterministic, nontrivial stream — unlike the zeros-weights period-1
ceiling) runs through the REAL continuous-batching engine with
speculation on, and the engine's spec_emitted / spec_slot_iters metrics
and output tokens must equal the simulator's prediction token-for-token.

The simulator is then what tools/spec_realism.py uses to measure draft
acceptance on realistic layout-JSON / markdown / HTML / SVG streams
(VERDICT r3 #6 / r4 item 5 — the acceptance half of the measured curve
behind the SPECULATE_K=2 shipping default, BENCH_SPEC_CURVE_r5.json).
"""

import dataclasses
import random

import pytest

from dots_ocr_tpu.engine.spec_sim import (
    bigram_chain,
    bigram_decoder_params,
    simulate_greedy_spec,
)
from dots_ocr_tpu.models.config import DotsOCRConfig


# ---------------------------------------------------------------------------
# Simulator unit behavior
# ---------------------------------------------------------------------------


class TestSimulator:
    def test_no_history_emits_one_per_iter(self):
        # Distinct tokens, no bigram repeats: every draft is the repeat-
        # current fallback, never correct -> 1 token (the bonus) per iter.
        stream = list(range(10, 30))
        r = simulate_greedy_spec(stream, 3)
        assert r.per_iter == [1] * r.num_iters
        assert r.acceptance == 0.0
        assert r.num_tokens == len(stream) - 1

    def test_period_one_loop_fully_accepts(self):
        # The repeat-current fallback catches degenerate loops: after the
        # first two iterations the drafts are all `current` and correct.
        stream = [7] * 40
        r = simulate_greedy_spec(stream, 3)
        # Every iteration except the stream-end truncation emits k+1.
        assert all(m == 4 for m in r.per_iter[:-1])
        assert r.emitted_per_iter > 3.0

    def test_cycle_accepts_after_one_lap(self):
        cycle = [5, 9, 13, 2, 30, 44]
        stream = cycle * 8
        r = simulate_greedy_spec(stream, 4)
        # First lap: no matches. Later laps: full acceptance.
        assert r.per_iter[0] == 1
        assert r.per_iter[-1] == 5

    def test_last_match_wins(self):
        # Bigram (1,2) occurs twice with different continuations; the
        # device takes the LAST occurrence (jnp.max over matches).
        #         0  1  2  3  4  5  6  7  8
        stream = [1, 2, 3, 1, 2, 4, 1, 2, 4]
        r = simulate_greedy_spec(stream, 1)
        # At i=7 (current=2, prev=1): last match t=4 -> draft [4]; true
        # next is 4 -> accepted (2 emitted).
        i, hits = 0, {}
        for m in r.per_iter:
            hits[i] = m
            i += m
        assert hits.get(7, hits.get(6)) is not None  # reached the tail

    def test_emitted_counts_conserve_stream(self):
        rng = random.Random(3)
        stream = [rng.randint(1, 9) for _ in range(400)]
        for k in (1, 2, 3, 5):
            r = simulate_greedy_spec(stream, k)
            assert sum(r.per_iter) == len(stream) - 1
            assert all(1 <= m <= k + 1 for m in r.per_iter)

    def test_k_must_be_positive(self):
        with pytest.raises(ValueError):
            simulate_greedy_spec([1, 2, 3], 0)


# ---------------------------------------------------------------------------
# Pin vs the real device program
# ---------------------------------------------------------------------------


def _bigram_setup(cycle_len=40, vocab=320, seed=1):
    cfg = DotsOCRConfig.tiny(vocab_size=vocab)
    cfg = dataclasses.replace(
        cfg,
        decoder=dataclasses.replace(
            cfg.decoder,
            vocab_size=vocab,
            hidden_size=vocab,  # one-hot rows need D >= V
            tie_word_embeddings=False,
        ),
    )
    rng = random.Random(seed)
    printable = list(range(33, 127))
    cycle = rng.sample(printable, cycle_len)
    table = {c: cycle[0] for c in range(vocab)}
    for i, c in enumerate(cycle):
        table[c] = cycle[(i + 1) % cycle_len]
    params = bigram_decoder_params(cfg, table)
    return cfg, params, table


def _engine(cfg, params, spec_k, depth):
    from dots_ocr_tpu.engine.scheduler import (
        ContinuousBatchingEngine,
        SchedulerConfig,
    )

    return ContinuousBatchingEngine(
        params,
        cfg,
        sched=SchedulerConfig(
            num_pages=64,
            page_size=8,
            max_slots=4,
            max_pages_per_seq=32,
            prompt_bucket_step=32,
            vision_bucket_step=16,
            steps_per_sync=depth,
            max_steps_per_sync=depth,
            speculate_k=spec_k,
            spec_min_tokens_per_iter=0.0,  # isolate from the EWMA gate
            repetition_min_repeats=0,
        ),
    )


@pytest.fixture(scope="module")
def bigram():
    return _bigram_setup()


def test_bigram_model_walks_the_table(bigram):
    cfg, params, table = bigram
    eng = _engine(cfg, params, spec_k=0, depth=2)
    text = eng.generate_one("walk", temperature=0.0, max_new_tokens=30)
    ids = [ord(ch) for ch in text]
    assert len(ids) == 30
    # Every emitted transition follows the table.
    for a, b in zip(ids, ids[1:]):
        assert table[a] == b, f"{a}->{b} not the table successor {table[a]}"


@pytest.mark.parametrize("spec_k,depth,budget", [(3, 4, 64), (2, 2, 48),
                                                 (5, 3, 96)])
def test_device_metrics_match_simulator(bigram, spec_k, depth, budget):
    cfg, params, table = bigram
    plain = _engine(cfg, params, spec_k=0, depth=depth)
    want = plain.generate_one("pin me", temperature=0.0,
                              max_new_tokens=budget)

    eng = _engine(cfg, params, spec_k=spec_k, depth=depth)
    got = eng.generate_one("pin me", temperature=0.0, max_new_tokens=budget)
    assert got == want, "speculative output diverged from sequential greedy"

    # Simulate on the same (infinite) chain: stream[0] is the prefill's
    # token; the chain is long enough that the device's chunk overshoot
    # never runs off the end.
    start = ord(want[0])
    horizon = budget + depth * (spec_k + 1) * 4
    stream = [start] + bigram_chain(table, start, horizon)
    sim = simulate_greedy_spec(stream, spec_k)

    # Replay the host chunk loop: the prefill emits 1 token; each chunk
    # runs `depth` verify iterations regardless of budget overshoot; the
    # request finishes at the first chunk boundary where the host has
    # >= budget tokens.
    host_total, dev_total, chunks, idx = 1, 0, 0, 0
    while host_total < budget:
        group = sim.per_iter[idx : idx + depth]
        assert len(group) == depth, "simulated stream too short"
        idx += depth
        dev_total += sum(group)
        host_total += sum(group)
        chunks += 1

    assert eng.metrics["spec_chunks"] == chunks
    assert eng.metrics["spec_slot_iters"] == chunks * depth
    assert eng.metrics["spec_emitted"] == dev_total


def test_simulator_speedup_fields():
    stream = [7] * 100
    r = simulate_greedy_spec(stream, 3)
    assert r.speedup_vs_plain == pytest.approx(r.emitted_per_iter / 1.33)
