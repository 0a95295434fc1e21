"""Multi-process data parallelism: 2 spawned jax.distributed CPU processes
(1 device each) must produce the same global train-step loss as a
single-process run on the same global batch — the test that replaces the
reference's untested multi-GPU DDP path (vec2wav/train.py:58-60,114)."""

import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_models import T2V_SMALL
from tests.test_train_steps import _t2v_synth_batch
from wavthruvec_pytorch_tpu.train import text2vec_train as t2v


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_procs(stage, num_procs=2, n_steps=1, ckpt_dir=""):
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    argv_tail = [stage, str(n_steps)] + ([ckpt_dir] if ckpt_dir else [])
    return [
        subprocess.Popen(
            [sys.executable, worker, coord, str(num_procs), str(i)] + argv_tail,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(worker))),
        )
        for i in range(num_procs)
    ]


def _collect(procs, tag="MULTIHOST_LOSS", timeout=900):
    """-> {proc_id: [loss per step]} for MULTIHOST_LOSS, {proc_id: loss} for
    single-value tags; asserts all workers exit 0."""
    per_proc = {}
    resume = {}
    cont = {}
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        for line in out.splitlines():
            if line.startswith("MULTIHOST_LOSS"):
                _, pid, step_i, val = line.split(" ", 3)
                per_proc.setdefault(int(pid), {})[int(step_i)] = float(eval(val))
            elif line.startswith("MULTIHOST_RESUME"):
                _, pid, val = line.split(" ", 2)
                resume[int(pid)] = float(eval(val))
            elif line.startswith("MULTIHOST_CONT"):
                _, pid, val = line.split(" ", 2)
                cont[int(pid)] = float(eval(val))
    losses = {
        pid: [d[i] for i in sorted(d)] for pid, d in per_proc.items()
    }
    return losses, resume, cont


@pytest.mark.slow
def test_two_process_loss_matches_single_process(tmp_path):
    # --- single-process ground truth on the full global batch ---
    cfg = T2V_SMALL
    batch = _t2v_synth_batch(cfg, B=4, seed=0)
    model, state = t2v.init_state(cfg, jax.random.PRNGKey(0), batch)
    step, _ = t2v.make_train_step(model, cfg)
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    expected = float(metrics["total_loss"])

    procs = _spawn_procs("t2v")
    losses, _, _ = _collect(procs)
    assert set(losses) == {0, 1}
    # both hosts see the same replicated global loss
    assert losses[0][0] == pytest.approx(losses[1][0], rel=1e-6)
    # and it matches the single-process run on the same global batch
    assert losses[0][0] == pytest.approx(expected, rel=2e-4, abs=2e-4)


@pytest.mark.slow
def test_two_process_gan_loss_matches_single_process(tmp_path):
    """Same mechanism for the Vec2Wav GAN step (dual optimizers, in-graph
    mel, spectral-norm state): 2-process global gen loss == single-process."""
    from tests.test_train_steps import _tiny_v2w_cfg, _v2w_synth_batch
    from wavthruvec_pytorch_tpu.train import vec2wav_train as v2w

    cfg = _tiny_v2w_cfg()
    batch = _v2w_synth_batch(cfg, B=4, seed=0)
    models, state = v2w.init_state(cfg, jax.random.PRNGKey(0), batch)
    step, _ = v2w.make_train_step(models, cfg)
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    expected = float(metrics["gen_loss_total"])

    procs = _spawn_procs("v2w")
    losses, _, _ = _collect(procs)
    assert set(losses) == {0, 1}
    assert losses[0][0] == pytest.approx(losses[1][0], rel=1e-6)
    assert losses[0][0] == pytest.approx(expected, rel=5e-4, abs=5e-4)


@pytest.mark.slow
def test_four_process_multistep_and_checkpoint_resume(tmp_path):
    """Scale-up of the DDP-replacement test: 4 jax.distributed processes run
    THREE steps (state donation across steps) that must match the
    single-process oracle step-by-step, then collectively orbax-save the
    sharded global state, restore it into a fresh init, and take one more
    step — which must equal the workers' own UNINTERRUPTED continuation
    step (checkpoint exactness, isolated from the small fp drift an
    N-device mesh accumulates vs single-process over optimizer steps)."""
    cfg = T2V_SMALL
    batch = _t2v_synth_batch(cfg, B=4, seed=0)
    model, state = t2v.init_state(cfg, jax.random.PRNGKey(0), batch)
    step, _ = t2v.make_train_step(model, cfg)
    expected = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(1 + i))
        expected.append(float(metrics["total_loss"]))

    procs = _spawn_procs("t2v", num_procs=4, n_steps=3,
                         ckpt_dir=str(tmp_path))
    losses, resume, cont = _collect(procs, timeout=1200)
    assert set(losses) == {0, 1, 2, 3}
    for pid in range(1, 4):  # replicated global loss identical across hosts
        assert losses[pid] == pytest.approx(losses[0], rel=1e-6)
    for i in range(3):  # and equal to single-process, step by step
        assert losses[0][i] == pytest.approx(expected[i], rel=5e-4, abs=5e-4)
    # resume-from-checkpoint == the uninterrupted continuation, exactly
    assert set(resume) == set(cont) == {0, 1, 2, 3}
    assert resume[0] == pytest.approx(cont[0], rel=1e-6)
    assert resume[1] == pytest.approx(resume[0], rel=1e-6)


@pytest.mark.slow
def test_two_process_production_loop(tmp_path):
    """The PRODUCTION Text2Vec loop (text2vec_loop.main) runs multi-process
    end-to-end: maybe_distributed_init from env vars, per-host buffer
    sharding, global-batch assembly, and the loop's globalize_state lift of
    the host-local train state onto the multi-process mesh (the step the
    direct-step worker used to do by hand)."""
    num_procs, max_steps = 2, 3
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    worker = os.path.join(os.path.dirname(__file__), "_multihost_loop_worker.py")
    root = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(num_procs), str(i),
             os.path.join(root, "data", "demo"), str(tmp_path), str(max_steps)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
            cwd=root,
        )
        for i in range(num_procs)
    ]
    done = {}
    for p in procs:
        out, err = p.communicate(timeout=2400)  # 1-CPU boxes compile slowly
        assert p.returncode == 0, f"loop worker failed:\n{out}\n{err}"
        for line in out.splitlines():
            if line.startswith("LOOPHOST_DONE"):
                _, pid, step_n = line.split()
                done[int(pid)] = int(step_n)
    assert done == {0: max_steps, 1: max_steps}


@pytest.mark.slow
def test_two_process_loop_validation_and_divergent_buckets(tmp_path):
    """Host-sharded validation + multi-bucket shape safety: the production
    t2v loop runs 2-process with TWO text buckets (per-host bucket picks can
    diverge across filelist shards — multi-process loaders must pad to the
    largest bucket) and --validate (mesh-sharded val_fn over per-host val
    shards; plain jit would reject the globally-replicated state)."""
    num_procs, max_steps = 2, 2
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    worker = os.path.join(os.path.dirname(__file__), "_multihost_loop_worker.py")
    root = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(num_procs), str(i),
             os.path.join(root, "data", "demo"), str(tmp_path),
             str(max_steps), "valdiverge"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
            cwd=root,
        )
        for i in range(num_procs)
    ]
    done = {}
    for p in procs:
        out, err = p.communicate(timeout=2400)
        assert p.returncode == 0, f"valdiverge worker failed:\n{out}\n{err}"
        for line in out.splitlines():
            if line.startswith("LOOPHOST_DONE"):
                _, pid, step_n = line.split()
                done[int(pid)] = int(step_n)
    assert done == {0: max_steps, 1: max_steps}


@pytest.mark.slow
def test_two_process_production_gan_loop(tmp_path):
    """The PRODUCTION Vec2Wav GAN loop (vec2wav_loop.main) runs 2-process
    end-to-end in windowed mode with one ``validate()`` call inside —
    covering the global->host-local state conversion at
    train/vec2wav_loop.py:59-65 (a collective every process must join) on
    top of filelist sharding and globalize_state.  Replaces the reference's
    never-tested DDP path (vec2wav/train.py:58-60,114).  Both processes must
    finish the same step count and agree on the validation mel error (the
    state is replicated, items are the full val set on each host)."""
    num_procs, max_steps = 2, 3
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    worker = os.path.join(os.path.dirname(__file__), "_multihost_gan_worker.py")
    root = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(num_procs), str(i),
             os.path.join(root, "data", "demo"), str(tmp_path), str(max_steps)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
            cwd=root,
        )
        for i in range(num_procs)
    ]
    done, val_errs = {}, {}
    for p in procs:
        out, err = p.communicate(timeout=2400)
        assert p.returncode == 0, f"gan loop worker failed:\n{out}\n{err}"
        for line in out.splitlines():
            if line.startswith("GANHOST_DONE"):
                _, pid, step_n, mel_err = line.split()
                done[int(pid)] = int(step_n)
                val_errs[int(pid)] = float(mel_err)
    assert done == {0: max_steps, 1: max_steps}
    assert val_errs[0] == pytest.approx(val_errs[1], rel=1e-4)
