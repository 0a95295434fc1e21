"""Worker for the N-process jax.distributed data-parallel tests.

Usage (spawned by tests/test_multihost.py):
    python tests/_multihost_worker.py <coordinator> <num_procs> <proc_id> \
        [stage] [n_steps] [ckpt_dir]

Each process owns 1 CPU device and its CONTIGUOUS 1/N slice of a
deterministic global batch (matching NamedSharding's device-order layout),
builds the global batch with ``shard_batch``
(make_array_from_process_local_data), replicates the state via
host_local_array_to_global_array, runs ``n_steps`` jitted train steps over
the N-device mesh, and prints the global loss per step.  With ``ckpt_dir``
it additionally exercises the multi-host checkpoint path: collective orbax
save after the steps, restore into a FRESH state, one more step from the
restored state, and prints that loss as MULTIHOST_RESUME.
"""

import os
import sys

coordinator, num_procs, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
stage = sys.argv[4] if len(sys.argv) > 4 else "t2v"
n_steps = int(sys.argv[5]) if len(sys.argv) > 5 else 1
ckpt_dir = sys.argv[6] if len(sys.argv) > 6 else ""

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=num_procs, process_id=proc_id
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_train_steps import (  # noqa: E402
    _t2v_synth_batch,
    _tiny_v2w_cfg,
    _v2w_synth_batch,
)
from tests.test_models import T2V_SMALL  # noqa: E402
from wavthruvec_pytorch_tpu.parallel import create_mesh, shard_batch  # noqa: E402

assert jax.process_count() == num_procs
assert len(jax.devices()) == num_procs  # one device per host

GLOBAL_B = 4

if stage == "t2v":
    from wavthruvec_pytorch_tpu.train import text2vec_train as t2v

    cfg = T2V_SMALL
    global_batch = _t2v_synth_batch(cfg, B=GLOBAL_B, seed=0)
    init_state, make_step = t2v.init_state, t2v.make_train_step
    loss_key = "total_loss"
else:
    from wavthruvec_pytorch_tpu.train import vec2wav_train as v2w

    cfg = _tiny_v2w_cfg()
    global_batch = _v2w_synth_batch(cfg, B=GLOBAL_B, seed=0)
    init_state, make_step = v2w.init_state, v2w.make_train_step
    loss_key = "gen_loss_total"

local = {
    k: np.asarray(v)[proc_id * (GLOBAL_B // num_procs):(proc_id + 1) * (GLOBAL_B // num_procs)]
    for k, v in global_batch.items()
}

mesh = create_mesh()
assert mesh.devices.size == num_procs

model, state = init_state(
    cfg, jax.random.PRNGKey(0), {k: jnp.asarray(v) for k, v in local.items()}
)
state = multihost_utils.host_local_array_to_global_array(state, mesh, P())

step, _ = make_step(model, cfg, mesh=mesh)
sharded = shard_batch(local, mesh)
for k, v in sharded.items():
    assert v.shape[0] == GLOBAL_B, (k, v.shape)  # logically global

for i in range(n_steps):
    state, metrics = step(state, sharded, jax.random.PRNGKey(1 + i))
    loss = float(metrics[loss_key])
    print(f"MULTIHOST_LOSS {proc_id} {i} {loss!r}", flush=True)

if ckpt_dir:
    # collective orbax save of the sharded/replicated global state, then the
    # multi-host resume path: restore into a FRESH init and take one more
    # step.  The same continuation step is also taken from the LIVE state
    # (before it gets donated) so the test can assert restore-exactness
    # without conflating it with the fp drift an N-device mesh accumulates
    # vs the single-process oracle over several optimizer steps.
    from wavthruvec_pytorch_tpu import checkpoint as ckpt

    path = os.path.join(ckpt_dir, "state_mh")
    ckpt.save_checkpoint(path, state)
    multihost_utils.sync_global_devices("after_save")

    _, metrics = step(state, sharded, jax.random.PRNGKey(1 + n_steps))
    print(f"MULTIHOST_CONT {proc_id} {float(metrics[loss_key])!r}", flush=True)

    _, fresh = init_state(
        cfg, jax.random.PRNGKey(7), {k: jnp.asarray(v) for k, v in local.items()}
    )
    fresh = multihost_utils.host_local_array_to_global_array(fresh, mesh, P())
    restored = ckpt.restore_checkpoint(path, fresh)
    restored, metrics = step(restored, sharded, jax.random.PRNGKey(1 + n_steps))
    loss = float(metrics[loss_key])
    print(f"MULTIHOST_RESUME {proc_id} {loss!r}", flush=True)
