"""Worker: run the PRODUCTION Vec2Wav GAN loop (vec2wav_loop.main) under
jax.distributed — N spawned CPU processes, one device each, WINDOWED mode.

Mirrors tests/_multihost_loop_worker.py for the vocoder stage: exercises
maybe_distributed_init from env vars, per-host filelist sharding
(process_shard at train/vec2wav_loop.py:112), the loop's globalize_state
lift (vec2wav_loop.py:148), and — the piece the direct-step worker does not
cover — ``validate()``'s global->host-local state conversion
(vec2wav_loop.py:59-65), a collective every process must join.

argv: coordinator num_procs proc_id data_root run_dir max_steps
Prints: GANHOST_DONE <proc_id> <final_step> <val_mel_err>
"""

import os
import sys

coordinator, num_procs, proc_id, data_root, run_dir, max_steps = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
    sys.argv[5], int(sys.argv[6]),
)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
# makes maybe_distributed_init() take its multi-process branch
os.environ["JAX_COORDINATOR_ADDRESS"] = coordinator
os.environ["JAX_NUM_PROCESSES"] = str(num_procs)
os.environ["JAX_PROCESS_ID"] = str(proc_id)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".cache", "jax_test")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from wavthruvec_pytorch_tpu.parallel import maybe_distributed_init  # noqa: E402

maybe_distributed_init()  # idempotent; the loop's own call becomes a no-op

# Establish the cross-process collective (gloo) context while the processes
# are still in lockstep (see _multihost_loop_worker.py).
_mesh = Mesh(np.array(jax.devices()), ("d",))
_x = jax.make_array_from_process_local_data(
    NamedSharding(_mesh, P("d")), np.ones((1,), np.float32), (num_procs,))
_s = jax.jit(lambda a: a.sum(), out_shardings=NamedSharding(_mesh, P()))(_x)
assert float(_s) == float(num_procs)

from wavthruvec_pytorch_tpu.config import Vec2WavConfig, load_config  # noqa: E402
from wavthruvec_pytorch_tpu.train import vec2wav_loop  # noqa: E402

cfg = load_config(Vec2WavConfig, os.path.join(data_root, "vec2wav_tiny.json"))
cfg = dataclasses.replace(
    cfg,
    run_path=run_dir,
    log_seed="mh_gan",
    batch_size=4,            # global batch; 2 per host
    split=True,              # windowed mode (the recommended throughput mode)
    segment_size=10 * cfg.total_upsample,  # 10-frame windows
    val_step=2,              # one validate() call lands inside max_steps=3
    save_step=10**9,
    log_step=10**9,
)
args = vec2wav_loop.parse_args(
    ["--max_steps", str(max_steps), "--training_epochs", "1000000",
     "--stdout_interval", "1000000"])

# capture validate()'s return through the loop by wrapping it
_val_result = {}
_orig_validate = vec2wav_loop.validate


def _spy_validate(*a, **kw):
    out = _orig_validate(*a, **kw)
    _val_result["mel_err"] = float(out)
    return out


vec2wav_loop.validate = _spy_validate
state = vec2wav_loop.main(args, cfg)
assert jax.process_count() == num_procs
assert "mel_err" in _val_result, "validate() never ran inside the loop"
print(f"GANHOST_DONE {proc_id} {int(state.step)} {_val_result['mel_err']:.6f}",
      flush=True)
