"""Aux subsystem tests: repetition guard, orbax checkpointing, distributed
helpers, observability."""

import logging

import jax
import numpy as np
import pytest

from dots_ocr_tpu.engine.repetition import detect_repetition


class TestRepetitionDetection:
    def test_period_one_loop(self):
        tokens = list(range(100)) + [7] * 150
        assert detect_repetition(tokens) == 1

    def test_multi_token_loop(self):
        tokens = list(range(100)) + [5, 9, 3] * 60
        assert detect_repetition(tokens) == 3

    def test_clean_text_not_flagged(self):
        rng = np.random.RandomState(0)
        tokens = rng.randint(0, 1000, 500).tolist()
        assert detect_repetition(tokens) is None

    def test_short_output_not_flagged(self):
        assert detect_repetition([7] * 50) is None  # below min_tail

    def test_legitimate_repetition_below_threshold(self):
        # 5 repeats of a 20-token block (table rows) — below min_repeats=8
        block = list(range(20))
        tokens = list(range(200)) + block * 5
        assert detect_repetition(tokens) is None

    def test_scheduler_stops_loops(self):
        from dots_ocr_tpu.engine.scheduler import (
            ContinuousBatchingEngine,
            SchedulerConfig,
        )
        from dots_ocr_tpu.models.config import DotsOCRConfig
        from dots_ocr_tpu.models.init import zeros_params

        cfg = DotsOCRConfig.tiny()
        # zeros params + greedy -> the model emits the same token forever
        params = zeros_params(cfg)
        engine = ContinuousBatchingEngine(
            params,
            cfg,
            sched=SchedulerConfig(
                num_pages=128, page_size=8, max_slots=2, max_pages_per_seq=64,
                prompt_bucket_step=32, vision_bucket_step=16, steps_per_sync=32,
                repetition_max_period=8, repetition_min_repeats=8,
            ),
            default_max_new_tokens=400,
        )
        rid = engine.submit("abc", temperature=0.0, max_new_tokens=400)
        engine.run()
        req = engine._finished[rid]
        assert req.finished_reason == "repetition"
        assert len(req.output_ids) < 400  # stopped early
        assert engine.metrics.get("repetition_stops", 0) == 1


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from dots_ocr_tpu.models.config import DotsOCRConfig
        from dots_ocr_tpu.models.init import init_params
        from dots_ocr_tpu.train.checkpoint import (
            latest_step,
            restore_checkpoint,
            save_checkpoint,
        )
        from dots_ocr_tpu.train.train_step import (
            init_train_state,
            make_dummy_batch,
            make_optimizer,
            train_step,
        )

        cfg = DotsOCRConfig.tiny()
        params = init_params(jax.random.PRNGKey(0), cfg)
        opt = make_optimizer(learning_rate=1e-3)
        state = init_train_state(params, opt)
        batch = make_dummy_batch(cfg, batch_size=2, seq_len=8)
        state, _ = train_step(state, batch, cfg, opt)

        path = str(tmp_path / "ckpt")
        save_checkpoint(path, state, cfg)
        assert latest_step(path) == 1

        fresh = init_train_state(init_params(jax.random.PRNGKey(1), cfg), opt)
        restored, cfg2 = restore_checkpoint(path, fresh)
        assert int(restored.step) == 1
        assert cfg2.decoder.num_layers == cfg.decoder.num_layers
        np.testing.assert_allclose(
            np.asarray(state.params["decoder"]["final_norm"], np.float32),
            np.asarray(restored.params["decoder"]["final_norm"], np.float32),
        )

        # resumed training continues from the restored state
        state2, metrics = train_step(restored, batch, cfg, opt)
        assert int(state2.step) == 2


class TestDistributedHelpers:
    def test_single_process_noop(self):
        from dots_ocr_tpu.parallel.distributed import initialize_distributed

        initialize_distributed()  # must not raise on single process

    def test_multihost_mesh_shape(self):
        from dots_ocr_tpu.parallel.distributed import multihost_mesh

        mesh = multihost_mesh(model_parallel=2)
        assert mesh.shape == {"data": 4, "model": 2}


class TestObservability:
    def test_phase_timer(self):
        from dots_ocr_tpu.utils.observability import PhaseTimer

        timer = PhaseTimer()
        with timer.phase("prefill"):
            pass
        with timer.phase("decode"):
            pass
        d = timer.as_dict()
        assert set(d) == {"prefill", "decode"}
        assert all(v >= 0 for v in d.values())

    def test_setup_logging_idempotent(self):
        from dots_ocr_tpu.utils.observability import setup_logging

        setup_logging()
        n = len(logging.getLogger().handlers)
        setup_logging()
        assert len(logging.getLogger().handlers) == n
