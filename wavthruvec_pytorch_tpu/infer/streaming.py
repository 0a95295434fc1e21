"""Streaming / chunked vocoder inference.

A pure addition over the reference (it always vocodes whole utterances):
process the latent sequence in fixed-size chunks with enough left/right
context to cover the conv stack's receptive field, so arbitrarily long
utterances synthesize in O(chunk) memory and audio can be emitted while
later chunks are still being computed (low time-to-first-audio serving).

Exactness: every Generator layer is pointwise, a 'same'-padded conv, or a
stride-u transposed conv — translation-invariant away from sequence edges —
and the CBN conditioning (spk ⊕ noise) is per-utterance, not per-position.
An interior chunk computed with ``context ≥ receptive field`` true frames on
both sides is therefore exact.  Edge chunks must see the *real* sequence
edge (the per-layer zero padding of the full forward is NOT equivalent to
feeding zero latents, because biases/CBN shifts make deeper layers' padding
nonzero), so the first window starts at frame 0 and the last window ends at
frame T — giving three jit signatures total when T is a multiple of
``chunk_frames`` (first / interior / last), plus one per distinct tail size
otherwise.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wavthruvec_pytorch_tpu.config import Vec2WavConfig


def conservative_context_frames(cfg: Vec2WavConfig) -> int:
    """Upper bound on the Generator's one-sided receptive field, in latent
    frames: conv_pre reach + each stage's (transposed-conv + resblock) reach
    mapped back through the cumulative upsampling factor."""
    reach = 3.0  # conv_pre k=7 'same'
    up = 1
    if cfg.use_resblock1:
        # ResBlock1 (vec2wav.py:82): per kernel, convs1 at dilations d[:3]
        # each chained with a dilation-1 convs2 conv.
        dils = [list(d)[:3] + [1] * 3 for d in cfg.resblock_dilation_sizes]
    else:
        # effective ResBlock2 (two convs per kernel, dilations d[:2])
        dils = [list(d)[:2] for d in cfg.resblock_dilation_sizes]
    for u, k in zip(cfg.upsample_rates, cfg.upsample_kernel_sizes):
        up *= u
        stage = float(k)  # transposed-conv window (generous)
        for rk, rd in zip(cfg.resblock_kernel_sizes, dils):
            for d in rd:
                stage += (rk - 1) / 2 * d
        reach += stage / up
    return int(math.ceil(reach)) + 1


class StreamingVocoder:
    """Chunked Generator inference with exact overlap-trim stitching.

    >>> sv = StreamingVocoder(gen, gen_vars, cfg, chunk_frames=100)
    >>> for audio in sv.stream(latents, spk_emb, noise):  # [B, chunk*320]
    ...     play(audio)
    """

    def __init__(
        self,
        gen,
        variables,
        cfg: Vec2WavConfig,
        chunk_frames: int = 100,
        context_frames: Optional[int] = None,
    ):
        self.gen = gen
        self.variables = variables
        self.cfg = cfg
        self.chunk = chunk_frames
        self.context = (
            context_frames if context_frames is not None
            else conservative_context_frames(cfg)
        )

        def fn(variables, lat, spk, noise):
            return gen.apply(variables, lat, spk, noise, train=False)

        self._fn = jax.jit(fn)

    def stream(
        self,
        latents: np.ndarray,
        spk_emb: np.ndarray,
        noise: np.ndarray,
        n_frames: Optional[int] = None,
    ) -> Iterator[np.ndarray]:
        """[B, T, C] latents -> iterator of [B, n*320] audio chunks covering
        [0, T) in order (n == chunk_frames except possibly the last)."""
        up = self.cfg.total_upsample
        K, C = self.context, self.chunk
        T = latents.shape[1] if n_frames is None else int(n_frames)

        for t0 in range(0, T, C):
            n_out = min(C, T - t0)
            # edge chunks must see the true sequence edge for exactness
            lo = max(0, t0 - K)
            hi = min(T, t0 + n_out + K)
            seg = latents[:, lo:hi]
            wav = np.asarray(
                self._fn(
                    self.variables,
                    jnp.asarray(seg, jnp.float32),
                    jnp.asarray(spk_emb, jnp.float32),
                    jnp.asarray(noise, jnp.float32),
                )
            )[..., 0]
            off = t0 - lo  # frames of left context actually present
            yield wav[:, off * up: (off + n_out) * up]

    def vocode(self, latents, spk_emb, noise, n_frames=None) -> np.ndarray:
        """Convenience: stream and concatenate (equals the full forward)."""
        return np.concatenate(
            list(self.stream(latents, spk_emb, noise, n_frames)), axis=1
        )
