"""Full training-loop integration: a few real steps through
text2vec_loop.main / vec2wav_loop.main on tiny on-disk datasets (TB logging,
config snapshot, checkpointing, per-epoch lr decay)."""

import dataclasses
import os

import numpy as np
import pytest

from tests.test_data_pipeline import SYMS, t2v_disk_dataset, v2w_disk_dataset  # noqa: F401
from wavthruvec_pytorch_tpu.train import text2vec_loop, vec2wav_loop


@pytest.mark.slow
def test_text2vec_loop_runs_and_checkpoints(tmp_path, t2v_disk_dataset):  # noqa: F811
    cfg, flist, vocab = t2v_disk_dataset
    cfg = dataclasses.replace(
        cfg,
        train_list=(flist,),
        vocab_path=vocab,
        run_path=str(tmp_path / "run"),
        log_seed="test",
        save_step=2,
        log_step=2,
        epochs=1,
    )
    args = text2vec_loop.parse_args(["--max_steps", "3", "--scalar_log_step", "1"])
    state = text2vec_loop.main(args, cfg)
    assert int(state.step) == 3
    # checkpoint written at step 2
    assert os.path.isdir(os.path.join(cfg.checkpoint_path, "checkpoint_2"))
    # config snapshot + logger artifacts
    assert os.path.exists(os.path.join(cfg.run_path, "test", "config.json"))
    assert os.path.exists(os.path.join(cfg.logger_path, "logger.txt"))

    # resume from the checkpoint
    args2 = text2vec_loop.parse_args(["--restore_step", "2", "--max_steps", "4"])
    state2 = text2vec_loop.main(args2, cfg)
    assert int(state2.step) >= 3


@pytest.mark.slow
def test_t2v_batched_metric_flush_preserves_tb_content(tmp_path,
                                                       t2v_disk_dataset):  # noqa: F811
    """The batched [K, 5] scalar flush must leave TB content identical to
    per-step fetching: one point per step for every tag, values equal to a
    flush-every-step run (same seed/data), including the final partial
    flush at loop exit."""
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    cfg0, flist, vocab = t2v_disk_dataset

    def run(tag, flush):
        cfg = dataclasses.replace(
            cfg0, train_list=(flist,), vocab_path=vocab,
            run_path=str(tmp_path / tag), log_seed="t",
            save_step=10**9, log_step=10**9, epochs=2,
        )
        args = text2vec_loop.parse_args(
            ["--max_steps", "5", "--metric_flush_steps", str(flush)])
        text2vec_loop.main(args, cfg)
        acc = EventAccumulator(cfg.tensorboard_logs_path)
        acc.Reload()
        return {t: [(e.step, e.value) for e in acc.Scalars(t)]
                for t in acc.Tags()["scalars"]}

    a = run("flush3", 3)   # 5 steps -> flushes at 3 and the final partial 2
    b = run("flush1", 1)
    assert set(a) == set(b) and len(a) == 5  # the 5 train/ tags
    for t in a:
        assert [s for s, _ in a[t]] == [1, 2, 3, 4, 5]
        np.testing.assert_allclose([v for _, v in a[t]],
                                   [v for _, v in b[t]], rtol=1e-6)


@pytest.mark.slow
def test_vec2wav_loop_runs_and_checkpoints(tmp_path, v2w_disk_dataset):  # noqa: F811
    cfg = v2w_disk_dataset
    cfg = dataclasses.replace(
        cfg,
        run_path=str(tmp_path / "run_dec"),
        log_seed="test",
        save_step=2,
        log_step=1,
        val_step=10**9,
    )
    args = vec2wav_loop.parse_args(
        ["--training_epochs", "2", "--max_steps", "3", "--stdout_interval", "1"]
    )
    state = vec2wav_loop.main(args, cfg)
    assert int(state.step) == 3
    assert os.path.isdir(os.path.join(cfg.checkpoint_path, "state_00000002"))
    # per-epoch lr decay applied
    lr = float(state.opt_g_state.hyperparams["learning_rate"])
    assert lr <= cfg.learning_rate + 1e-9
