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

Timing methodology (axon runtime quirks):
* ``block_until_ready`` does not actually block here, so every timed call
  returns a SCALAR from the jitted program and is forced with a host fetch;
* calls are timed as a CHAIN of queued dispatches (each scalar folded into
  a device accumulator) with one final fetch, so the +-5 ms per-call fetch
  drift is amortized; the same chain over a null program is subtracted
  (submit cost);
* each measurement is the median of K=5 independent chains with slow-chain
  rejection (>1.5x the fastest) — a single chain can be poisoned by one
  runtime/tunnel stall (this corrupted BENCH_r02); the torch-CPU baseline
  is the median of 10 iterations for the same reason;
* fori_loop-wrapping large model graphs explodes this compiler's time, so
  iterations are separate dispatches of one compiled program with varying
  inputs (no result caching exists across dispatches);
* a persistent compilation cache keeps repeat runs fast.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N_FRAMES = 500  # 10 s of 16 kHz audio at x320 upsampling


def _enable_compile_cache():
    try:
        import jax

        os.makedirs("/root/repo/.jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compile_cache()


def _one_chain(fn, args_list):
    """Total wall time of one chain of dispatches with ONE final fetch."""
    t0 = time.perf_counter()
    acc = None
    for a in args_list:
        s = fn(a)
        acc = s if acc is None else acc + s
    float(acc)
    return time.perf_counter() - t0


def _chained_time(fn, args_list, warmup=3, n_chains=5, outlier_factor=1.5):
    """Per-call time: median over K independent chains, stall-rejected.

    Each call's scalar is folded into an accumulator on device, so the host
    queues work without round-tripping per call — the reliable methodology
    for this runtime (BENCH_NOTES "Timing methodology correction"): per-call
    fetch latency drifts +-5 ms and would otherwise be charged to the model.

    A single chain is NOT stall-proof: one runtime/tunnel hiccup inside the
    chain (~0.7 s observed) poisons its whole average — this corrupted the
    official BENCH_r02 capture (224x recorded for a ~1100x system).  So we
    time ``n_chains`` independent chains, drop any chain slower than
    ``outlier_factor`` x the fastest, and report the median of the survivors.
    """
    for a in args_list[:warmup]:
        s = fn(a)
        float(s + s)  # also warm the scalar-accumulate program
    chain = args_list[warmup:]
    totals = sorted(_one_chain(fn, chain) for _ in range(n_chains))
    kept = [t for t in totals if t <= outlier_factor * totals[0]]
    return float(np.median(kept)) / len(chain)


def _build_ours(iters: int = 24):
    import jax
    import jax.numpy as jnp

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
    t2v_vars = jax.jit(
        lambda k1, k2: t2v.init({"params": k1, "dropout": k2}, src_seq,
                                src_pos, ref_feat, N_FRAMES, 1.0,
                                method=Text2Vec.infer)
    )(r1, r2)
    spk = jax.random.normal(r3, (B, v2w_cfg.spk_dim))
    noise0 = jax.random.normal(r3, (B, v2w_cfg.noise_dim))
    latents0 = jnp.zeros((B, N_FRAMES, v2w_cfg.n_feat_dim))
    gen_vars = jax.jit(
        lambda k: gen.init(k, latents0, spk, noise0, train=False)
    )(r3)

    # params are explicit jit ARGUMENTS — closed-over trees would be inlined
    # as HLO literals and blow the compile-transport size cap.
    @jax.jit
    def e2e_scalar(tv, gv, eps):
        out = t2v.apply(tv, src_seq, src_pos, ref_feat + eps,
                        N_FRAMES, 1.0, method=Text2Vec.infer)
        wav = gen.apply(gv, out["feat_postnet_output"], spk, noise0 + eps,
                        train=False)
        return jnp.sum(wav[0, ::1024, 0])

    # real latents for the vocoder leg + reference comparison
    latents = jax.jit(
        lambda v: t2v.apply(v, src_seq, src_pos, ref_feat, N_FRAMES, 1.0,
                            method=Text2Vec.infer)["feat_postnet_output"]
    )(t2v_vars)

    @jax.jit
    def voc_scalar(gv, lat, eps):
        wav = gen.apply(gv, lat + eps, spk, noise0 + eps, train=False)
        return jnp.sum(wav[0, ::1024, 0])

    @jax.jit
    def null_scalar(eps):
        return eps * 2.0

    eps_list = [jnp.float32(i) * 1e-20 for i in range(iters)]
    # chained-dispatch overhead: per-call submit cost + amortized final fetch
    overhead = _chained_time(null_scalar, eps_list)
    t_e2e = max(
        _chained_time(lambda e: e2e_scalar(t2v_vars, gen_vars, e), eps_list)
        - overhead,
        1e-9,
    )
    t_voc = max(
        _chained_time(lambda e: voc_scalar(gen_vars, latents, e), eps_list)
        - overhead,
        1e-9,
    )

    audio_seconds = N_FRAMES * v2w_cfg.total_upsample / v2w_cfg.sampling_rate
    return audio_seconds / t_e2e, audio_seconds / t_voc, np.asarray(latents)


def _measure_reference_vocoder(latents: np.ndarray, iters: int = 20):
    """Reference PyTorch Generator on CPU over the same latents (config 1).

    Best (min-time) of ``iters`` >= 20 timed forwards: this 1-vCPU host is a
    shared VM with variable hypervisor steal — a 2-iteration mean swung the
    recorded ratio 153.5 -> 201.3 -> 332.8 across runs, and even 20-run
    medians varied 10.96-13.03x across processes.  The min is the
    least-contended sample, i.e. the closest to the reference's true
    hardware cost and the most charitable to it (smallest vs_baseline).
    NOTE: any concurrent CPU load still slows every iteration and INFLATES
    vs_baseline; run bench.py alone."""
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
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                y = g(x, spk, noise)
                ts.append(time.perf_counter() - t0)
            dt = float(np.min(ts))
        audio_seconds = y.shape[-1] / hp.sampling_rate
        return audio_seconds / dt
    finally:
        sys.path.remove(path)
        for k in ("hparams", "utils", "modules", "models"):
            sys.modules.pop(k, None)


def _supervise(argv):
    """Self-supervising launcher: run the real bench in a CHILD process and
    retry if it hangs.

    ~half of fresh-process launches in this environment hang indefinitely at
    TPU acquisition (tunnel re-establishment) BEFORE any timed region — they
    produce no output at all rather than a bad number, and a killed hung
    process is reliably followed by a successful one.  The supervisor gives
    each attempt ``timeout`` seconds (a good run takes ~150-180 s incl. the
    torch baseline), kills a hung child, waits, and relaunches — so a single
    driver invocation of ``python bench.py`` always yields a number.
    """
    import subprocess

    timeout, attempts = 420.0, 3
    env = dict(os.environ)
    env["WAVTHRUVEC_BENCH_CHILD"] = "1"
    for attempt in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + argv,
                timeout=timeout, env=env)
            if proc.returncode == 0:
                return 0
            print(f"# bench child exited rc={proc.returncode} "
                  f"(attempt {attempt + 1}/{attempts})", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"# bench child hung >{timeout:.0f}s at TPU acquisition; "
                  f"retrying (attempt {attempt + 1}/{attempts})",
                  file=sys.stderr)
        time.sleep(20)  # let the tunnel settle before re-acquiring
    print("# all bench attempts failed", file=sys.stderr)
    return 1


def main():
    ours_e2e_xrt, ours_voc_xrt, latents = _build_ours()
    try:
        ref_voc_xrt = _measure_reference_vocoder(latents)
        vs_baseline = ours_voc_xrt / ref_voc_xrt
        print(f"# components: ours_e2e={ours_e2e_xrt:.1f}x "
              f"ours_voc={ours_voc_xrt:.1f}x ref_voc_cpu={ref_voc_xrt:.2f}x",
              file=sys.stderr)
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
    if os.environ.get("WAVTHRUVEC_BENCH_CHILD"):
        main()
    else:
        sys.exit(_supervise(sys.argv[1:]))
