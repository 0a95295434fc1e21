"""Worker: run the PRODUCTION Text2Vec training loop (text2vec_loop.main)
under jax.distributed — N spawned CPU processes, one device each.

Unlike tests/_multihost_worker.py (which drives the jitted step directly and
does its own host_local_array_to_global_array), this exercises the real loop
end-to-end: per-host buffer sharding (data/dataset.py process_shard), global
batch assembly (shard_batch), and the loop's own globalize_state lift of the
train state onto the multi-process mesh.

argv: coordinator num_procs proc_id data_root run_dir max_steps [mode]
mode "valdiverge" additionally exercises host-sharded validation
(--validate with a per-host val shard + mesh-sharded val_fn) and MULTIPLE
shape buckets — per-host bucket picks can diverge across filelist shards,
which only works because multi-process loaders pad to the largest bucket
(BucketedLoader pad_to_max).
Prints: LOOPHOST_DONE <proc_id> <final_step>
"""

import os
import sys

coordinator, num_procs, proc_id, data_root, run_dir, max_steps = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
    sys.argv[5], int(sys.argv[6]),
)
mode = sys.argv[7] if len(sys.argv) > 7 else "plain"

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

# Establish the cross-process collective (gloo) context NOW, while the
# processes are still in lockstep: the first collective otherwise happens
# minutes into the train-step compile, and on a 1-CPU box compile skew
# between the processes can blow gloo's 30 s context-init deadline.
_mesh = Mesh(np.array(jax.devices()), ("d",))
_x = jax.make_array_from_process_local_data(
    NamedSharding(_mesh, P("d")), np.ones((1,), np.float32), (num_procs,))
_s = jax.jit(lambda a: a.sum(), out_shardings=NamedSharding(_mesh, P()))(_x)
assert float(_s) == float(num_procs)

from wavthruvec_pytorch_tpu.config import Text2VecConfig, load_config  # noqa: E402
from wavthruvec_pytorch_tpu.train import text2vec_loop  # noqa: E402

cfg = load_config(Text2VecConfig, os.path.join(data_root, "text2vec_tiny.json"))
cfg = dataclasses.replace(
    cfg,
    run_path=run_dir,
    log_seed="mh",
    batch_size=4,          # global batch; 2 per host
    batch_expand_size=1,
    text_buckets=(16,),    # single bucket -> one step compile
    epochs=10**6,
    log_step=10**9,
    save_step=10**9,
)
argv = ["--max_steps", str(max_steps)]
if mode == "valdiverge":
    # two text buckets: per-host picks could diverge, pad_to_max must hold;
    # val every step through the mesh-sharded val_fn
    cfg = dataclasses.replace(cfg, text_buckets=(8, 16), val_step=1)
    argv.append("--validate")
args = text2vec_loop.parse_args(argv)
state = text2vec_loop.main(args, cfg)
assert jax.process_count() == num_procs
print(f"LOOPHOST_DONE {proc_id} {int(state.step)}", flush=True)
