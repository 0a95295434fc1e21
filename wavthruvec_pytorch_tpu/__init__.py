"""WavThruVec-TPU: a TPU-native (JAX/XLA/Pallas/pjit) re-design of the
two-stage WavThruVec TTS pipeline.

Stage 1 (Text2Vec): FastSpeech-style FFT encoder/decoder mapping raw text to
wav2vec-2.0 latent frames, with RAD-TTS unsupervised alignment (ConvAttention
+ beta-binomial prior + on-device Viterbi MAS), a duration predictor / length
regulator, a CBHG postnet and an ECAPA-TDNN speaker encoder.

Stage 2 (Vec2Wav): HiFi-GAN-style vocoder mapping wav2vec latents (+ speaker
embedding + noise through Conditional BatchNorm) to 16 kHz waveform, trained
against Multi-Period and Multi-Scale discriminators.

Capability parity target: the reference PyTorch implementation at
p1an-lin-jung/WavThruVec_pytorch (see SURVEY.md). This package is a from
scratch TPU-first design: functional Flax modules, jitted train/infer steps,
static shapes via length bucketing, `lax.scan`-based sequential ops, XLA/Pallas
kernels for the hot paths and `jax.sharding.Mesh` data parallelism instead of
DDP/NCCL.
"""

__version__ = "0.1.0"

from wavthruvec_pytorch_tpu import config  # noqa: F401
