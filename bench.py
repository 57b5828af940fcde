"""Benchmark: flagship XL (750M) text-to-audio, 25-step CFG Euler CFM, 10 s clip.

Measures the full generation path on one TPU chip (DiT ODE -> VAE decode ->
BigVGAN vocode). Emits a cumulative JSON line after EVERY completed stage
(flush=True), so a partial run still reports the headline number:

  stage 0  headline bf16 p50 latency     (exactly ONE cold XLA compile)
  stage 1  fp32-mode p50 + bf16-vs-fp32 mel drift (the parity-gate mode)
  stage 2  batched throughput (8, then 16, 32)
  stage 3  component breakdown (ODE / VAE / vocoder) + ODE MFU
  stage 4  text-encoder latency

Every line is a superset of the previous one; the last printed line is the
most complete. vs_baseline is relative to the BASELINE.md north star of
1.0 s per 10 s clip on one v5e chip (>1.0 means faster than the target).

Cold-cache behavior (the driver may run this on a fresh VM where the
persistent compile cache is empty; each XL compile through the remote-compile
tunnel takes >10 min): the headline stage compiles exactly one program and
prints its JSON line before anything else is compiled. Later stages are
skipped when the remaining wall-clock budget (MAA3_BENCH_BUDGET_S, default
3000 s) cannot fit their estimated compile time, which is calibrated from the
measured stage-0 compile.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from maa3_tpu.utils import enable_compile_cache


def _tunnel_watchdog(timeout_s: float = 180.0):
    """Log loudly if backend init never answers: a client killed
    mid-remote-compile can wedge the axon tunnel for 1h+, and without this
    the bench dies as an unexplained rc=124 with an empty log (BENCH_r01
    post-mortem legibility).

    Deliberately creates NO device claim of its own: an earlier version
    probed `jax.devices()` in a subprocess and killed it on timeout — but a
    claim killed in flight is itself what wedges the grant, so the watchdog
    could renew the very wedge it was diagnosing. Instead a pure-stdlib
    child (python -S: no sitecustomize, so no PJRT registration) sleeps and
    prints the diagnostic unless the main process has touched a sentinel
    file after its own (single, patient, never-killed) init. Returns the
    arm-completion callback."""
    import subprocess
    import tempfile

    sentinel = tempfile.mktemp(prefix="maa3_bench_init_")
    code = (
        "import os,sys,time; time.sleep(%f); "
        "os.path.exists(%r) or sys.stderr.write("
        "'[bench] WATCHDOG: device backend unresponsive after %.0fs -- "
        "the axon tunnel is likely wedged (stale server-side grant). "
        "The bench waits until it recovers; an rc=124 here is the tunnel, "
        "not the benchmark.\\n')" % (timeout_s, sentinel, timeout_s))
    try:
        subprocess.Popen([sys.executable, "-S", "-c", code],
                         stdout=subprocess.DEVNULL)  # stderr shared
    except Exception:
        pass  # diagnostic only — never block the bench

    def init_done():
        try:
            open(sentinel, "w").close()
        except Exception:
            pass

    return init_done


def _patient_init(budget_s: float) -> None:
    """Single patient backend init. Hangs while a wedge lasts (never killed
    from here — a killed claim renews the wedge) and RETRIES on explicit
    init errors: a server-side outage answers claims with `UNAVAILABLE: TPU
    backend setup/compile error` after ~25 min, and a one-shot init would
    turn a transient outage into a lost benchmark round."""
    t0 = time.perf_counter()
    while True:
        try:
            jax.devices()
            return
        except Exception as e:
            waited = time.perf_counter() - t0
            if waited > budget_s:
                raise
            print(f"[bench] backend init failed after {waited:.0f}s "
                  f"({repr(e)[:120]}) — retrying (outage?)",
                  file=sys.stderr, flush=True)
            time.sleep(60.0)


_watchdog_done = _tunnel_watchdog()
_patient_init(budget_s=float(
    os.environ.get("MAA3_BENCH_BUDGET_S", "3000")) * 0.75)
_watchdog_done()
if jax.default_backend() != "cpu":
    enable_compile_cache()

from maa3_tpu.models.dit import DiTConfig, dit_param_count
from maa3_tpu.models.vae1d import VAEConfig
from maa3_tpu.models.bigvgan import BigVGANConfig
from maa3_tpu.pipeline import T2APipeline

NORTH_STAR_S = 1.0
LATENT_LEN = 312          # 10 s: 625 mel frames // 2
CTX_LEN = 154             # CLAP(77) ++ T5(77)
STEPS = 25
V5E_PEAK_BF16 = 197e12

T_START = time.perf_counter()
BUDGET_S = float(os.environ.get("MAA3_BENCH_BUDGET_S", "3000"))

RESULT = {"metric": "t2a_xl_10s_latency_p50", "unit": "s",
          "stages_completed": []}


def note(msg: str) -> None:
    """Progress to stderr (stdout carries only the JSON result lines)."""
    print(f"[bench +{time.perf_counter() - T_START:.0f}s] {msg}",
          file=sys.stderr, flush=True)


def remaining() -> float:
    return BUDGET_S - (time.perf_counter() - T_START)


def emit(stage: str) -> None:
    RESULT["stages_completed"] = RESULT["stages_completed"] + [stage]
    RESULT["elapsed_s"] = round(time.perf_counter() - T_START, 1)
    print(json.dumps(RESULT), flush=True)


def median_time(fn, args, n=5):
    """Median wall time of fn, forcing completion with a host fetch.

    On the tunneled axon backend block_until_ready() can return before the
    computation finishes (observed under-reporting); fetching a scalar
    reduction is reliable and costs one extra RPC (~ms), so timings here are
    honest upper bounds."""
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def component_time(fn, args, n=5):
    """Per-call device time via the shared 1-vs-3 slope estimator
    (scripts/_probe_util.slope_time) — one copy of the RPC-cancelling
    methodology for bench and probes alike."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "scripts"))
    from _probe_util import slope_time
    return slope_time(fn, args, n=n)


def main():
    import dataclasses
    import numpy as np

    key = jax.random.PRNGKey(0)
    xl = DiTConfig(in_channels=20, context_dim=1024, hidden_size=1152,
                   depth=28, num_heads=16, max_len=1000)
    note("init: XL random weights (~3 GB fp32, minutes on the 1-core host)")
    pipe32 = T2APipeline.random_init(key, xl, VAEConfig(), BigVGANConfig(),
                                     compute_dtype=jnp.float32)
    note("init done")
    # Zero-init adaLN/final/gates make every block an identity at init —
    # perturb them so the ODE moves and the bf16-vs-fp32 drift reflects the
    # full 28-block path (latency itself is value-independent).
    from maa3_tpu.utils.nprand import (cast_matmul_weights, fuse_dit_gemms,
                                       unfreeze_zero_init)
    pipe32.params["dit"] = unfreeze_zero_init(pipe32.params["dit"], key)

    # bf16 serving copy: bf16 weight storage halves DiT weight HBM reads per
    # ODE step; wqkv/w13 fusion: one wide MXU GEMM per site (numerics
    # unchanged). fp32 params stay around for the parity-gate mode (stage 1).
    params16 = dict(pipe32.params)
    params16["dit"] = fuse_dit_gemms(
        cast_matmul_weights(pipe32.params["dit"], jnp.bfloat16))
    # serving mode: fp32 residual carry is measured FREE on the v5e (p50
    # unchanged) and cuts latent drift ~3x (scripts/measure_precision_drift)
    pipe = dataclasses.replace(
        pipe32, compute_dtype=jnp.bfloat16, params=params16,
        dit_cfg=dataclasses.replace(xl, fp32_residual=True))
    n_params = dit_param_count(pipe32.params["dit"])
    # planned sampling hoists the adaLN modulation GEMMs, the cross-attn K/V
    # projections and the embedders OUT of the per-step scan, so the per-step
    # FLOPs only involve the residual-stream weights:
    blk = pipe32.params["dit"]["blocks"]
    n_step_params = sum(
        int(x.size) for grp in ("attention", "feed_forward")
        for k_, v in blk[grp].items() if k_ not in ("wk_y", "wv_y", "gate")
        for x in jax.tree.leaves(v)) + int(
        pipe32.params["dit"]["proj_in"]["w"].size) + int(
        pipe32.params["dit"]["final_layer"]["linear"]["w"].size)

    ctx = jax.random.normal(key, (1, CTX_LEN, 1024), jnp.float32)
    uc = jnp.zeros_like(ctx)
    gen_key = jax.random.PRNGKey(1)

    # ---- stage 0: headline bf16 p50 (ONE cold compile) -------------------
    def run(k):
        z, mel, wav = pipe.generate(ctx, uc, k, latent_len=LATENT_LEN,
                                    guidance_scale=5.0, steps=STEPS)
        return wav

    note("stage 0: compiling bf16 generate (the one cold compile)")
    t0 = time.perf_counter()
    mel16 = np.asarray(pipe.generate(ctx, uc, gen_key, latent_len=LATENT_LEN,
                                     guidance_scale=5.0, steps=STEPS)[1],
                       dtype=np.float32)
    compile_s = time.perf_counter() - t0  # compile + first run
    note(f"stage 0: compiled+ran in {compile_s:.1f}s; timing")
    p50 = median_time(run, (gen_key,))

    RESULT.update({
        "value": round(p50, 4),
        "vs_baseline": round(NORTH_STAR_S / p50, 3),
        "precision": "bf16 matmuls/weights, fp32 islands",
        "compile0_s": round(compile_s, 1),
        "budget_s": BUDGET_S,
    })
    emit("headline_bf16")

    # compile-cost estimate for gating later stages: stage-0 compile plus
    # slack (warm cache => seconds => everything runs; cold => ~12 min each)
    est_compile = compile_s * 1.2 + 60.0

    # ---- stage 1: fp32 parity-gate mode + drift --------------------------
    # The reference inference path is fp32 (scripts/txt2audio_for_2cap_flow.py
    # loads model.cuda() with no autocast), and the BASELINE.md quality gate
    # (mel MAE < 1e-3) is defined against it — so publish the fp32-mode p50
    # alongside the bf16 fast mode, plus the measured bf16-vs-fp32 mel drift.
    def run32(k):
        z, mel, wav = pipe32.generate(ctx, uc, k, latent_len=LATENT_LEN,
                                      guidance_scale=5.0, steps=STEPS)
        return wav

    if remaining() > est_compile:
        try:
            t0 = time.perf_counter()
            mel32 = np.asarray(pipe32.generate(
                ctx, uc, gen_key, latent_len=LATENT_LEN, guidance_scale=5.0,
                steps=STEPS)[1], dtype=np.float32)  # same key => same x0
            compile32_s = time.perf_counter() - t0
            p50_32 = median_time(run32, (gen_key,))
            RESULT.update({
                "latency_p50_fp32_s": round(p50_32, 4),
                "vs_baseline_fp32": round(NORTH_STAR_S / p50_32, 3),
                "mel_mae_bf16_vs_fp32": float(np.abs(mel16 - mel32).mean()),
                "compile_fp32_s": round(compile32_s, 1),
            })
            emit("fp32_mode")
        except Exception as e:  # never lose already-emitted stages
            RESULT["fp32_error"] = repr(e)[:200]
            emit("fp32_mode_failed")

    # ---- stage 1b: TRUE-fp32 matmul parity mode --------------------------
    # On TPU the DEFAULT matmul precision computes fp32 dots via bf16 MXU
    # passes; 'highest' (6-pass fp32 emulation) is the mode that actually
    # reproduces fp32 reference math. Published alongside so the quality
    # gate has an unambiguous anchor.
    if remaining() > est_compile:
        try:
            with jax.default_matmul_precision("highest"):
                mel32h = np.asarray(pipe32.generate(
                    ctx, uc, gen_key, latent_len=LATENT_LEN,
                    guidance_scale=5.0, steps=STEPS)[1], dtype=np.float32)
                p50_32h = median_time(run32, (gen_key,), n=3)
            RESULT.update({
                "latency_p50_fp32_highest_s": round(p50_32h, 4),
                "mel_mae_bf16_vs_fp32_highest":
                    float(np.abs(mel16 - mel32h).mean()),
            })
            if "mel_mae_bf16_vs_fp32" in RESULT:
                RESULT["mel_mae_fp32_default_vs_highest"] = float(
                    np.abs(mel32 - mel32h).mean())
            emit("fp32_highest_mode")
        except Exception as e:
            RESULT["fp32_highest_error"] = repr(e)[:200]
            emit("fp32_highest_mode_failed")

    pipe8 = None  # set by stage 1c; reused by the int8 throughput stage

    # ---- stage 1c: int8 (w8a8) turbo serving mode ------------------------
    # Per-step DiT GEMMs quantized to int8 (ops/quant.py): measured ODE
    # 115.6 -> 93.6 ms and p50 0.220 -> 0.195 s on v5e, at ~2x the bf16
    # mode's mel drift (5.1e-3 vs 2.5e-3 MAE vs fp32). Published as its own
    # mode so the latency/quality tradeoff is explicit. The vocoder stays
    # bf16: round-4 per-stage probes measured int8 losing to bf16 lax.conv
    # on every wide vocoder stage (tap-GEMM and unfold forms both).
    if remaining() > est_compile:
        try:
            from maa3_tpu.ops.quant import quantize_dit_serving
            params8 = dict(pipe32.params)
            params8["dit"] = cast_matmul_weights(
                quantize_dit_serving(fuse_dit_gemms(pipe32.params["dit"])),
                jnp.bfloat16)
            pipe8 = dataclasses.replace(pipe, params=params8)

            def run8(k):
                return pipe8.generate(ctx, uc, k, latent_len=LATENT_LEN,
                                      guidance_scale=5.0, steps=STEPS)[2]

            note("stage 1c: compiling int8 serving generate")
            mel8 = np.asarray(pipe8.generate(
                ctx, uc, gen_key, latent_len=LATENT_LEN, guidance_scale=5.0,
                steps=STEPS)[1], dtype=np.float32)
            p50_8 = median_time(run8, (gen_key,))
            RESULT.update({
                "latency_p50_int8_s": round(p50_8, 4),
                "vs_baseline_int8": round(NORTH_STAR_S / p50_8, 3),
                "mel_mae_int8_vs_bf16": float(np.abs(mel8 - mel16).mean()),
            })
            if "mel_mae_bf16_vs_fp32" in RESULT:
                RESULT["mel_mae_int8_vs_fp32"] = float(
                    np.abs(mel8 - mel32).mean())
            emit("int8_mode")
        except Exception as e:
            pipe8 = None
            RESULT["int8_error"] = repr(e)[:200]
            emit("int8_mode_failed")

    # ---- stage 2: batched throughput (bf16) ------------------------------
    # Batched serving mix: bf16 ODE + per-stage vocoder routing (Pallas AA
    # narrow / XLA AA wide, _pallas_aa_max_ch).
    best_tp, best_b = 0.0, 0
    tp_by_batch = {}
    for bsz in (8, 16, 32):
        if remaining() < est_compile:
            break
        try:
            ctx_b = jnp.broadcast_to(ctx, (bsz,) + ctx.shape[1:])
            uc_b = jnp.zeros_like(ctx_b)

            def run_b(k):
                _, _, wav = pipe.generate(ctx_b, uc_b, k,
                                          latent_len=LATENT_LEN,
                                          guidance_scale=5.0, steps=STEPS)
                return wav

            run_b(jax.random.PRNGKey(99))  # compile + warmup
            tb = median_time(run_b, (jax.random.PRNGKey(100 + bsz),), n=3)
            tp = bsz * 10.0 / tb
            tp_by_batch[bsz] = round(tp, 1)
            if tp > best_tp:
                best_tp, best_b = tp, bsz
            RESULT.update({
                "throughput_secs_audio_per_sec_chip": round(best_tp, 1),
                "throughput_batch": best_b,
                "throughput_by_batch": tp_by_batch,
            })
            emit(f"throughput_b{bsz}")
        except Exception as e:
            RESULT["throughput_error"] = repr(e)[:200]
            emit(f"throughput_b{bsz}_failed")
            break

    # ---- stage 2b: int8 batched throughput sweep --------------------------
    # w8a8 halves exactly the activation bytes PROBE_BATCH_DECOMPOSE blames
    # for the b16/b32 ODE falloff — the by-batch sweep is the experiment
    # that closes (or refutes) that story.
    tp8_by_batch = {}
    for bsz in (8, 16, 32):
        if pipe8 is None or remaining() < est_compile:
            break
        try:
            ctx_b = jnp.broadcast_to(ctx, (bsz,) + ctx.shape[1:])
            uc_b = jnp.zeros_like(ctx_b)

            def run_b8(k):
                return pipe8.generate(ctx_b, uc_b, k, latent_len=LATENT_LEN,
                                      guidance_scale=5.0, steps=STEPS)[2]

            note(f"stage 2b: compiling int8 b{bsz} generate")
            run_b8(jax.random.PRNGKey(99))  # compile + warmup
            tb = median_time(run_b8, (jax.random.PRNGKey(200 + bsz),), n=3)
            tp8_by_batch[bsz] = round(bsz * 10.0 / tb, 1)
            best8 = max(tp8_by_batch, key=tp8_by_batch.get)
            RESULT.update({
                "throughput_int8_secs_audio_per_sec_chip":
                    tp8_by_batch[best8],
                "throughput_int8_batch": best8,
                "throughput_int8_by_batch": tp8_by_batch,
            })
            emit(f"throughput_int8_b{bsz}")
        except Exception as e:
            RESULT["throughput_int8_error"] = repr(e)[:200]
            emit(f"throughput_int8_b{bsz}_failed")
            break

    # ---- stage 3: component breakdown (batch 1) --------------------------
    if remaining() > est_compile:
        try:
            x0 = jax.random.normal(jax.random.PRNGKey(2),
                                   (1, 20, LATENT_LEN), jnp.float32)
            scale = jnp.float32(5.0)
            ode_t = component_time(
                lambda x: pipe._sample_latent(pipe.params, x, ctx, uc, scale,
                                              STEPS), (x0,))
            z1 = pipe._sample_latent(pipe.params, x0, ctx, uc, scale, STEPS)
            dec_t = component_time(
                lambda z: pipe._decode_mel(pipe.params, z), (z1,))
            mel1 = pipe._decode_mel(pipe.params, z1)
            voc_t = component_time(
                lambda m: pipe._vocode(pipe.params, m), (mel1,))

            # ODE MFU: 25 steps x dual-batch fwd, flops ~ 2 * P_step * tokens
            ode_flops = STEPS * 2 * 2 * n_step_params * LATENT_LEN
            RESULT.update({
                "ode_ms": round(ode_t * 1e3, 1),
                "vae_decode_ms": round(dec_t * 1e3, 1),
                "vocoder_ms": round(voc_t * 1e3, 1),
                "ode_mfu": round(ode_flops / ode_t / V5E_PEAK_BF16, 3),
            })
            emit("components")
        except Exception as e:
            RESULT["components_error"] = repr(e)[:200]
            emit("components_failed")

    # ---- stage 3b: component breakdown at batch 8 ------------------------
    # (the vocoder round-4 target is per-CLIP device time at b8 with the
    # w8a8 wide stages + chunked-unfold routing — this is its evidence)
    if remaining() > est_compile:
        try:
            x0_8 = jax.random.normal(jax.random.PRNGKey(4),
                                     (8, 20, LATENT_LEN), jnp.float32)
            ctx_8 = jnp.broadcast_to(ctx, (8,) + ctx.shape[1:])
            uc_8 = jnp.zeros_like(ctx_8)
            scale = jnp.float32(5.0)
            ode_t8 = component_time(
                lambda x: pipe._sample_latent(pipe.params, x, ctx_8,
                                              uc_8, scale, STEPS), (x0_8,))
            z8 = pipe._sample_latent(pipe.params, x0_8, ctx_8, uc_8,
                                     scale, STEPS)
            mel8b = pipe._decode_mel(pipe.params, z8)
            voc_t8 = component_time(
                lambda m: pipe._vocode(pipe.params, m), (mel8b,))
            RESULT.update({
                "ode_ms_per_clip_b8": round(ode_t8 / 8 * 1e3, 1),
                "vocoder_ms_per_clip_b8": round(voc_t8 / 8 * 1e3, 1),
            })
            emit("components_b8")
        except Exception as e:
            RESULT["components_b8_error"] = repr(e)[:200]
            emit("components_b8_failed")

    # ---- stage 4: text-encoder latency -----------------------------------
    # (CLAP-BERT + T5-v1.1-large at real shapes; the conditioning tower runs
    # once per prompt, outside the per-step hot loop)
    if remaining() > est_compile:
        try:
            from maa3_tpu.models.clap import (CLAPFLANConfig, clap_flan_init,
                                              clap_flan_encode)
            enc_cfg = CLAPFLANConfig()
            enc_params = clap_flan_init(jax.random.PRNGKey(3), enc_cfg)
            enc_params = cast_matmul_weights(enc_params, jnp.bfloat16)
            ids = jnp.ones((1, enc_cfg.max_length), jnp.int32)

            @jax.jit
            def encode(p, a, b):
                return clap_flan_encode(p, enc_cfg, a, b,
                                        compute_dtype=jnp.bfloat16)

            enc_t = component_time(lambda a: encode(enc_params, a, ids),
                                   (ids,))
            RESULT.update({
                "text_encode_ms": round(enc_t * 1e3, 1),
                "e2e_with_encode_s": round(p50 + enc_t, 4),
            })
            emit("encoder")
        except Exception as e:
            RESULT["encoder_error"] = repr(e)[:200]
            emit("encoder_failed")

    # ---- stage 5: XXL (1.47B) serving point ------------------------------
    # First time anything XXL-sized executes on the real chip: bf16 weights
    # (~2.9 GB) fit one v5e. Host init of the 1.47B random pytree is
    # minutes on the 1-core VM, so this stage is last and double-gated.
    if remaining() > est_compile * 1.5 + 300.0:
        try:
            # free the XL param sets first: fp32 + bf16 + int8 DiT copies
            # (~5.8 GB) plus the 1.47B XXL init (5.9 fp32 + 2.9 bf16
            # transient) OOM'd a 16 GB chip in the first r04 run
            note("stage 5: freeing XL DiT copies")
            for tree in ([pipe32.params["dit"], params16["dit"]]
                         + ([pipe8.params["dit"]] if pipe8 is not None
                            else [])):
                for leaf in jax.tree.leaves(tree):
                    leaf.delete()
            pipe8 = None

            note("stage 5: XXL init (1.47B random weights, minutes on host)")
            xxl = DiTConfig(in_channels=20, context_dim=1024,
                            hidden_size=1536, depth=32, num_heads=32,
                            max_len=1000)
            pipe_xxl32 = T2APipeline.random_init(
                jax.random.PRNGKey(7), xxl, VAEConfig(), BigVGANConfig(),
                compute_dtype=jnp.float32)
            pipe_xxl32.params["dit"] = unfreeze_zero_init(
                pipe_xxl32.params["dit"], jax.random.PRNGKey(7))
            n_xxl = dit_param_count(pipe_xxl32.params["dit"])

            # per-leaf DONATED bf16 cast: the fp32 master frees as the cast
            # proceeds, capping the transient at fp32+one-leaf instead of
            # fp32+bf16 trees both live
            _cast16 = jax.jit(lambda a: a.astype(jnp.bfloat16),
                              donate_argnums=0)

            def cast_free(path, a):
                names = [str(getattr(q, "key", getattr(q, "idx", q)))
                         for q in path]
                if names and names[-1] == "w" and a.ndim >= 2:
                    return _cast16(a)
                return a

            params_x = dict(pipe_xxl32.params)
            params_x["dit"] = fuse_dit_gemms(
                jax.tree_util.tree_map_with_path(
                    cast_free, pipe_xxl32.params["dit"]))
            pipe_xxl32.params["dit"] = None  # fp32 master donated away
            pipe_xxl = dataclasses.replace(
                pipe_xxl32, compute_dtype=jnp.bfloat16, params=params_x,
                dit_cfg=dataclasses.replace(xxl, fp32_residual=True))

            def run_xxl(k):
                return pipe_xxl.generate(ctx, uc, k, latent_len=LATENT_LEN,
                                         guidance_scale=5.0, steps=STEPS)[2]

            note("stage 5: compiling XXL bf16 generate")
            run_xxl(gen_key)
            p50_xxl = median_time(run_xxl, (gen_key,))
            RESULT.update({
                "xxl_params": int(n_xxl),
                "xxl_latency_p50_s": round(p50_xxl, 4),
                "xxl_vs_baseline": round(NORTH_STAR_S / p50_xxl, 3),
            })
            emit("xxl_b1")
            if remaining() > est_compile:
                ctx_b = jnp.broadcast_to(ctx, (8,) + ctx.shape[1:])
                uc_b = jnp.zeros_like(ctx_b)

                def run_xxl_b(k):
                    return pipe_xxl.generate(ctx_b, uc_b, k,
                                             latent_len=LATENT_LEN,
                                             guidance_scale=5.0,
                                             steps=STEPS)[2]

                run_xxl_b(jax.random.PRNGKey(99))
                tb = median_time(run_xxl_b, (jax.random.PRNGKey(201),), n=3)
                RESULT["xxl_throughput_b8"] = round(8 * 10.0 / tb, 1)
                emit("xxl_b8")
        except Exception as e:
            RESULT["xxl_error"] = repr(e)[:200]
            emit("xxl_failed")


if __name__ == "__main__":
    main()
