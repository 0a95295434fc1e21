"""Offline analysis of the val-NaN params captured by t2v_val_nan_repro.py.

Runs on CPU: restores the checkpoint saved at the first non-finite
validation step, replays the validation set batch by batch to find the
offending batch, then re-runs that batch with Flax capture_intermediates
to locate the first module whose output goes non-finite.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

ROOT = "/tmp/big_demo"
OUT = "/tmp/nan_repro"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--step", type=int, required=True,
                   help="checkpoint step to analyze (e.g. 5000)")
    a = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")

    from wavthruvec_pytorch_tpu import checkpoint as ckpt
    from wavthruvec_pytorch_tpu.config import Text2VecConfig, load_config
    from wavthruvec_pytorch_tpu.data.dataset import BucketedLoader, load_buffer
    from wavthruvec_pytorch_tpu.models.losses import (
        attention_binarization_loss,
        dnn_loss,
    )
    from wavthruvec_pytorch_tpu.text import TextFrontend
    from wavthruvec_pytorch_tpu.train import text2vec_train as t2v

    cfg = load_config(Text2VecConfig, f"{ROOT}/text2vec.json")
    cfg = dataclasses.replace(
        cfg, batch_size=8, batch_expand_size=1,
        text_buckets=(32,), frame_buckets=(64,),
    )
    frontend = TextFrontend.from_vocab_file(cfg.vocab_path)
    val_lists = [q for q in cfg.val_list if os.path.exists(q)]
    val_buffer = load_buffer(val_lists, cfg, frontend)
    val_loader = BucketedLoader(val_buffer, cfg, seed=42, shuffle=False)

    first = next(val_loader.epoch())
    first.pop("audiopaths", None)
    first_j = {k: jnp.asarray(v) for k, v in first.items()}
    model, state = t2v.init_state(cfg, jax.random.PRNGKey(42), first_j)
    path = os.path.join(OUT, "repro", "model_new", f"checkpoint_{a.step}")
    state = ckpt.restore_checkpoint(path, state)
    print(f"restored {path}")

    def val_losses(batch):
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["text"], batch["src_pos"], batch["feat_target"],
            batch["input_lengths"], batch["output_lengths"], batch["feat_pos"],
            attn_prior=batch["attn_prior"], deterministic=True, train_bn=False,
        )
        w, pl, d = dnn_loss(
            outputs["feat_output"], outputs["feat_postnet_output"],
            batch["feat_target"], outputs["duration_predictor_output"],
            outputs["duration"],
        )
        b = attention_binarization_loss(outputs["attn"], outputs["attn_soft"])
        return {"WVF": w, "postnet": pl, "dur": d, "bin": b}, outputs

    bad = None
    for i, batch in enumerate(val_loader.epoch()):
        paths = batch.pop("audiopaths", None)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        losses, outputs = val_losses(jb)
        finite = {k: bool(np.isfinite(float(v))) for k, v in losses.items()}
        flag = "" if all(finite.values()) else "   <-- NON-FINITE"
        print(f"batch {i}: " + ", ".join(
            f"{k}={float(v):.4f}" for k, v in losses.items()) + flag)
        if not all(finite.values()) and bad is None:
            bad = (i, jb, paths, outputs)

    if bad is None:
        print("no non-finite val batch at this checkpoint")
        return

    i, jb, paths, outputs = bad
    print(f"\n--- batch {i} items: {paths}")
    for k, v in outputs.items():
        arr = np.asarray(v)
        n_bad = int(np.size(arr) - np.isfinite(arr).sum())
        print(f"output[{k}]: shape {arr.shape}, non-finite {n_bad}")

    # locate the first non-finite intermediate
    _, mutated = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jb["text"], jb["src_pos"], jb["feat_target"],
        jb["input_lengths"], jb["output_lengths"], jb["feat_pos"],
        attn_prior=jb["attn_prior"], deterministic=True, train_bn=False,
        capture_intermediates=True, mutable=["intermediates"],
    )

    from flax.traverse_util import flatten_dict

    flat = flatten_dict(mutated["intermediates"])
    print("\n--- non-finite intermediates (module call order not guaranteed;"
          " sorted by path) ---")
    for key, vals in flat.items():
        # a module may return tuples/dicts of arrays — walk the leaves
        for v in jax.tree_util.tree_leaves(vals):
            arr = np.asarray(v)
            if arr.dtype.kind == "f" and not np.isfinite(arr).all():
                n_bad = int(np.size(arr) - np.isfinite(arr).sum())
                print("/".join(map(str, key)), arr.shape,
                      f"non-finite {n_bad}/{arr.size}",
                      f"max|finite| {np.nanmax(np.abs(np.where(np.isfinite(arr), arr, 0))):.3e}")


if __name__ == "__main__":
    main()
