"""BatchNorm running-stat recalibration for long-trained checkpoints.

Why this exists: LAMB's trust ratio grows the scale-invariant pre-BN conv
weights without bound (the loss never sees the growth because train-mode BN
renormalizes every batch), so a long-trained checkpoint's eval-mode BN —
the production inference path, same math as the reference's ``model.eval()``
(text2vec/eval.py:24) — can amplify an outlier input ~1e4x per ECAPA block
until f32 overflows and the model emits NaN audio (BENCH_NOTES "Val-NaN
root cause").

The fix is reference-math-neutral: re-estimate the BN population statistics
by forwarding N calibration items with batch-statistics BN (exactly what
training-mode BN computes) and storing the averaged moments as the new
running stats.  Train-mode outputs are invariant to this, and eval-mode
outputs move *toward* the train-mode behavior the loss was optimized for —
the standard "BN re-estimation" recipe (cf. SWA).

Implementation detail: flax updates ``batch_stats`` as an EMA
``new = m*old + (1-m)*batch``.  We zero the old stats first so each pass
returns exactly ``(1-m)*batch`` and the pure per-batch moments are recovered
by division — no EMA-order dependence, a true population average over all
calibration batches.
"""

from __future__ import annotations

from typing import Iterable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _bn_momentum() -> float:
    """The EMA momentum every BN layer in this package uses.

    The ``(1-m)`` unwinding below is only correct if it matches the layers'
    actual momentum; read it from the shared ``layers.BatchNorm`` field
    default instead of hardcoding, so a future momentum change there cannot
    silently mis-scale recalibrated stats."""
    from wavthruvec_pytorch_tpu.models.layers import BatchNorm

    return float(BatchNorm.momentum)


def _population_average(collect_fn, variables, batches,
                        momentum: float | None = None):
    """Average pure per-batch BN moments over ``batches``.

    ``collect_fn(vars_with_zeroed_stats, batch) -> batch_stats`` must run the
    model with train-mode BN and ``mutable=["batch_stats"]``; with zeroed old
    stats the returned tree equals ``(1-momentum) * batch_moments``.
    ``momentum`` defaults to the package-wide ``layers.BatchNorm.momentum``.
    """
    if momentum is None:
        momentum = _bn_momentum()
    zeroed = jax.tree_util.tree_map(
        jnp.zeros_like, variables["batch_stats"]
    )
    base = dict(variables)
    base["batch_stats"] = zeroed
    acc = None
    n = 0
    for batch in batches:
        bs = collect_fn(base, batch)
        acc = bs if acc is None else jax.tree_util.tree_map(jnp.add, acc, bs)
        n += 1
    if n == 0:
        raise ValueError("recalibration needs at least one calibration batch")
    scale = 1.0 / ((1.0 - momentum) * n)
    new_stats = jax.tree_util.tree_map(lambda s: s * scale, acc)
    out = dict(variables)
    out["batch_stats"] = jax.device_get(new_stats)
    return out


def recalibrate_text2vec_bn(
    t2v,
    variables,
    batches: Iterable[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    max_frames: int,
    alpha: float = 1.0,
    momentum: float | None = None,
):
    """Refresh Text2Vec BN stats (ECAPA speaker encoder + CBHG postnet).

    ``batches``: iterable of ``(src_seq [B,N] int, src_pos [B,N] int,
    wav_feat [B,T,n_feat])`` — real texts plus real speaker-reference clips,
    so the ECAPA stats see the serving input distribution and the CBHG stats
    see the model's own decoder outputs (exactly the serving data flow).
    Returns a new variables dict; params are untouched.
    """
    from wavthruvec_pytorch_tpu.models import Text2Vec

    @jax.jit
    def collect(vs, batch):
        src_seq, src_pos, wav_feat = batch
        _, mut = t2v.apply(
            vs, src_seq, src_pos, wav_feat, max_frames, alpha,
            train_bn=True, method=Text2Vec.infer, mutable=["batch_stats"],
        )
        return mut["batch_stats"]

    def run(vs, batch):
        seq, pos, feat = batch
        return collect(
            vs,
            (jnp.asarray(seq, jnp.int32), jnp.asarray(pos, jnp.int32),
             jnp.asarray(feat, jnp.float32)),
        )

    return _population_average(run, variables, batches, momentum=momentum)


def recalibrate_generator_bn(
    gen,
    variables,
    batches: Iterable[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    momentum: float | None = None,
):
    """Refresh the Vec2Wav Generator's Conditional-BN stats.

    ``batches``: iterable of ``(latents [B,T,n_feat], spk_emb [B,192],
    noise [B,192])``.  Same hazard class as the Text2Vec BNs (eval-mode
    running stats diverging from train-mode batch stats), included for
    completeness; AdamW grows weights far slower than LAMB so the exposure
    is smaller in practice.
    """

    @jax.jit
    def collect(vs, batch):
        latents, spk, noise = batch
        # "spectral" must be mutable (CBN's spectral-norm power iteration
        # updates u/v in train mode) but its updates are discarded — only
        # batch_stats are recalibrated.
        _, mut = gen.apply(
            vs, latents, spk, noise, train=True,
            mutable=["batch_stats", "spectral"],
        )
        return mut["batch_stats"]

    def run(vs, batch):
        lat, spk, noise = batch
        return collect(
            vs,
            (jnp.asarray(lat, jnp.float32), jnp.asarray(spk, jnp.float32),
             jnp.asarray(noise, jnp.float32)),
        )

    return _population_average(run, variables, batches, momentum=momentum)


def text2vec_calibration_batches(
    frontend,
    cfg,
    items: Sequence[Tuple[str, np.ndarray]],
    batch_size: int = 8,
):
    """Build ``(src_seq, src_pos, wav_feat)`` calibration batches from
    ``(text, ref_feat [T,n_feat])`` items (e.g. filelist rows), padded to the
    config's text buckets so the jitted collect program reuses the serving
    shapes."""
    from wavthruvec_pytorch_tpu.train.text2vec_train import pad_to_bucket

    out = []
    for i in range(0, len(items), batch_size):
        chunk = items[i : i + batch_size]
        texts = [t for t, _ in chunk]
        feats = [f for _, f in chunk]
        ids, _ = frontend.encode_batch(
            texts,
            pad_to=pad_to_bucket(
                max(len(frontend.text_to_sequence(t)) for t in texts),
                cfg.text_buckets,
            ),
        )
        src_pos = np.where(ids != 0, np.arange(1, ids.shape[1] + 1)[None], 0)
        t_max = max(f.shape[0] for f in feats)
        wav = np.zeros((len(feats), t_max, cfg.n_feat_dim), np.float32)
        for j, f in enumerate(feats):
            wav[j, : f.shape[0]] = f
        out.append((ids.astype(np.int32), src_pos.astype(np.int32), wav))
    return out
