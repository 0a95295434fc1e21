"""Benchmark: end-to-end text->latent->wav synthesis RTF on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

* value: x-realtime factor (generated audio seconds per wall-clock second)
  for the full pipeline — Text2Vec.infer (FFT enc/dec + on-device duration
  expansion + CBHG) into the Vec2Wav Generator — batch 1, 16 kHz, full-size
  config, 500 latent frames (10 s of audio) per utterance.
* vs_baseline: ratio of our vocoder-leg x-realtime (TPU) to the reference
  PyTorch Generator's x-realtime on CPU for the same latents (BASELINE.md
  config 1: precomputed latents -> 16 kHz wav; the reference publishes no
  numbers, so it is measured locally — torch in this image is CPU-only).

Timing methodology: the runtime in this image does not implement a blocking
``block_until_ready`` (verified: it returns immediately), so each timed
region is a single jitted ``lax.fori_loop`` chaining ITERS full pipeline
iterations — each iteration's inputs depend on the loop carry so XLA cannot
hoist the body — followed by a scalar device->host fetch that forces
completion.  Per-iteration time = (t_N - t_1) / (N - 1) to cancel the
constant dispatch+fetch overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N_FRAMES = 500  # 10 s of 16 kHz audio at x320 upsampling


def _enable_compile_cache():
    """Remote compiles through the axon tunnel take minutes per program;
    the persistent cache makes repeat runs (and driver re-runs) fast."""
    try:
        import jax

        os.makedirs("/root/repo/.jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compile_cache()


def _build_ours():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from wavthruvec_pytorch_tpu.config import Text2VecConfig, Vec2WavConfig
    from wavthruvec_pytorch_tpu.models import Generator, Text2Vec

    t2v_cfg = Text2VecConfig()
    v2w_cfg = Vec2WavConfig()
    B, N, REF_T = 1, 32, 128

    t2v = Text2Vec(t2v_cfg)
    gen = Generator(v2w_cfg)
    rng = jax.random.PRNGKey(0)
    r1, r2, r3 = jax.random.split(rng, 3)
    src_seq = jnp.concatenate(
        [jax.random.randint(r1, (B, N - 2), 4, t2v_cfg.vocab_size),
         jnp.zeros((B, 2), jnp.int32)], axis=1)
    src_pos = jnp.where(src_seq != 0, jnp.arange(1, N + 1, dtype=jnp.int32)[None], 0)
    ref_feat = jax.random.normal(r2, (B, REF_T, t2v_cfg.n_feat_dim)) * 0.1
    t2v_vars = t2v.init({"params": r1, "dropout": r2}, src_seq, src_pos,
                        ref_feat, N_FRAMES, 1.0, method=Text2Vec.infer)
    spk = jax.random.normal(r3, (B, v2w_cfg.spk_dim))
    latents0 = jnp.zeros((B, N_FRAMES, v2w_cfg.n_feat_dim))
    noise0 = jax.random.normal(r3, (B, v2w_cfg.noise_dim))
    gen_vars = gen.init(r3, latents0, spk, noise0, train=False)

    def one_iter(i, carry, include_t2v):
        # perturb inputs with the carry so the loop body can't be hoisted
        eps = carry * 1e-20
        noise = noise0 + eps
        if include_t2v:
            out = t2v.apply(t2v_vars, src_seq, src_pos, ref_feat + eps,
                            N_FRAMES, 1.0, method=Text2Vec.infer)
            latents = out["feat_postnet_output"]
        else:
            latents = latents0 + eps
        wav = gen.apply(gen_vars, latents, spk, noise, train=False)
        return jnp.sum(wav[0, ::1024, 0])

    def make_loop(include_t2v):
        @jax.jit
        def run(n_iters):  # traced trip count: one compile serves all n
            def body(i, carry):
                return carry + one_iter(i, carry, include_t2v)

            return lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

        return run

    def timed(include_t2v, n1=2, n2=18, reps=3):
        run = make_loop(include_t2v)
        float(run(1))  # compile + warm
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(run(n1)); t1 = time.perf_counter()
            float(run(n2)); t2 = time.perf_counter()
            samples.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
        return max(float(np.median(samples)), 1e-9)

    audio_seconds = N_FRAMES * v2w_cfg.total_upsample / v2w_cfg.sampling_rate
    e2e_s = timed(include_t2v=True)
    voc_s = timed(include_t2v=False)
    # deterministic latents for the reference comparison
    out = t2v.apply(t2v_vars, src_seq, src_pos, ref_feat, N_FRAMES, 1.0,
                    method=Text2Vec.infer)
    latents = np.asarray(out["feat_postnet_output"])
    return audio_seconds / e2e_s, audio_seconds / voc_s, latents


def _measure_reference_vocoder(latents: np.ndarray, iters: int = 2):
    """Reference PyTorch Generator on CPU over the same latents (config 1)."""
    import importlib.util

    import torch

    path = "/root/reference/vec2wav"
    sys.path.insert(0, path)
    try:
        for k in ("hparams", "utils", "modules", "models"):
            sys.modules.pop(k, None)
        spec = importlib.util.spec_from_file_location(
            "ref_models_bench", os.path.join(path, "models.py"))
        ref_models = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_models)
        hp = ref_models.hp
        torch.manual_seed(0)
        g = ref_models.Generator(hp)
        g.eval()
        g.remove_weight_norm()  # reference inference-export path (models.py:149)
        x = torch.from_numpy(latents.transpose(0, 2, 1).copy())
        spk = torch.zeros(1, hp.spk_dim)
        noise = torch.zeros(1, hp.noise_dim)
        with torch.no_grad():
            y = g(x, spk, noise)  # warmup
            t0 = time.perf_counter()
            for _ in range(iters):
                y = g(x, spk, noise)
            dt = (time.perf_counter() - t0) / iters
        audio_seconds = y.shape[-1] / hp.sampling_rate
        return audio_seconds / dt
    finally:
        sys.path.remove(path)
        for k in ("hparams", "utils", "modules", "models"):
            sys.modules.pop(k, None)


def main():
    ours_e2e_xrt, ours_voc_xrt, latents = _build_ours()
    try:
        ref_voc_xrt = _measure_reference_vocoder(latents)
        vs_baseline = ours_voc_xrt / ref_voc_xrt
    except Exception as e:  # reference not runnable -> no ratio
        print(f"# reference measurement failed: {e}", file=sys.stderr)
        vs_baseline = -1.0
    print(json.dumps({
        "metric": "e2e text->wav synthesis x-realtime (batch=1, 16kHz, 1 chip); "
                  "vs_baseline = vocoder-leg xRT ratio vs reference torch-CPU",
        "value": round(ours_e2e_xrt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
