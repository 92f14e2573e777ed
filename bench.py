"""Benchmark: denoise steps/sec/chip on the flagship FlowDiffuser config.

Measures the FULL scanned reverse-diffusion loop (``p_sample_loop`` — one
XLA program over all timesteps, the production sampling shape, reference
denoising_diffusion.py:700-729) at the flagship configuration
(flow_diffuser.yaml: 128x128, target=joint) on the default JAX device, with
a single host readback so tunnel round-trips don't pollute the measurement.
Compared against a cached single-host CPU baseline (BASELINE.md target:
>=10x CPU denoise steps/sec/chip).

Incremental emission (VERDICT r3 #2): the headline JSON line prints the
moment it is measured, and the line is RE-printed (cumulative) after every
secondary row — the driver parses the LAST line, so a timeout can only
lose not-yet-measured rows, never the whole run.  A wall-clock budget
guard (BENCH_BUDGET_S, default 520 s) skips remaining rows with
``<row>_skipped`` markers instead of dying.  All programs share a
persistent compilation cache so re-runs skip XLA compile entirely.

Line shape:
  {"metric": "denoise_steps_per_sec_per_chip", "value": N, "unit": "steps/s",
   "vs_baseline": N / cpu_steps_per_sec,
   "extra": {"train_samples_per_sec": N, ...}}

Set BENCH_HEADLINE_ONLY=1 to skip the secondary measurements.
"""

from __future__ import annotations

import functools
import json
import os
import time

CPU_BASELINE_FILE = os.path.join(os.path.dirname(__file__), "BASELINE_CPU.json")

_T0 = time.monotonic()
_BUDGET = float(os.environ.get("BENCH_BUDGET_S", "520"))


def _remaining() -> float:
    return _BUDGET - (time.monotonic() - _T0)


def _setup_cache():
    import jax

    path = os.environ.get("OFD_BENCH_CACHE",
                          os.path.expanduser("~/.cache/ofd_bench_jax"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def _build_sampler(image_size: int, batch: int, timesteps: int, precision: str):
    import jax
    import jax.numpy as jnp

    from opticalflowdiffusion_tpu.algorithms.flow_diffuser import FlowDiffuser
    from opticalflowdiffusion_tpu.config import compose
    from opticalflowdiffusion_tpu.models import diffusion as dm

    cfg = compose(
        [
            "experiment=matrix_flow",
            "dataset=artificial",
            "algorithm=flow_diffuser",
            f"algorithm.image_size={image_size}",
            f"algorithm.timesteps={timesteps}",
            f"+algorithm._precision={precision}",
        ]
    )
    algo = FlowDiffuser(cfg.algorithm)
    cond = jnp.zeros((batch, image_size, image_size, 3), jnp.float32)
    params = _shared_params(algo, precision)

    from opticalflowdiffusion_tpu.utils import xla_opts

    @functools.partial(jax.jit, compiler_options=xla_opts.compiler_options())
    def run(params, cond, rng):
        img, _ = dm.p_sample_loop(
            algo.sched, algo._model_fn(params), rng,
            (batch, image_size, image_size, algo.channels),
            external_cond=cond,
        )
        return jnp.sum(img.astype(jnp.float32))

    return run, params, cond


PEAK_FLOPS = {"tpu": 197e12}  # v5e bf16 MXU peak

_FLOPS_CACHE_FILE = os.path.join(os.path.dirname(__file__),
                                 ".bench_flops_cache.json")
# key -> reason for any flop-count failure this run (surfaced as
# `mfu_*_skipped_reason` in the output line — never silent)
_FLOPS_ERRORS: dict = {}


def _xla_flops(jitted, *args, scan_steps: int = 1, key: str = None) -> float:
    """Total model FLOPs of a jitted program from XLA's cost analysis.

    The default conv dispatch IS XLA (round 4), so the jitted program is
    fully visible to the cost analysis as-is — no env flip, and NEVER
    ``jax.clear_caches()`` (the round-3 bench timed out exactly because it
    discarded every cached compilation between rows).  When a Pallas
    backend is forced via OFD_CONV_BACKEND the count would be wrong
    (opaque custom calls), so we return 0 rather than juggling trace-time
    env state.  Counts are memoized to a JSON file keyed by ``key`` so
    re-runs skip even the AOT lowering.

    ``scan_steps``: HLO cost analysis counts a while/scan BODY ONCE
    (measured: scan(body, length=10) reports the same flops as body) —
    callers whose program is a sampler/train scan must pass the trip
    count.  Prologue/epilogue flops outside the scan get multiplied too;
    they are negligible next to the per-step UNet evals.
    """
    import sys

    cache = {}
    if key and os.path.exists(_FLOPS_CACHE_FILE):
        try:
            cache = json.load(open(_FLOPS_CACHE_FILE))
        except Exception:
            cache = {}
        if key in cache:
            return float(cache[key]) * scan_steps
    if os.environ.get("OFD_CONV_BACKEND") in ("fold", "pallas"):
        _FLOPS_ERRORS[key or "?"] = "pallas conv backend forced (opaque)"
        return 0.0
    try:
        # cost_analysis() on the LOWERED module (no compile): through the
        # axon tunnel every XLA compile costs minutes regardless of program
        # size, so the round-3 lower().compile() here is what blew the
        # budget.  Pre-optimization flop counts match the compiled analysis
        # for this model family (convs/dots dominate; fusion doesn't change
        # math op counts).
        c = jitted.lower(*args).cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0] if c else None
        if c is None:
            # this backend returns None from the LOWERED module's analysis
            # (found by the loud-failure path, round 5 — this None was the
            # silent r4 MFU loss); the COMPILED module's analysis works and
            # the compile is a persistent-cache hit after any bench/prewarm
            # run of the same program
            c = jitted.lower(*args).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
        flops = float(c.get("flops", 0.0))
    except Exception as e:
        # LOUD failure (VERDICT r4 #3: the silent `return 0.0` here cost
        # round 4 its MFU evidence in the driver artifact)
        reason = f"{type(e).__name__}: {e}"
        print(f"[bench] _xla_flops({key}) failed: {reason}",
              file=sys.stderr, flush=True)
        _FLOPS_ERRORS[key or "?"] = reason[:200]
        return 0.0
    if key:
        cache[key] = flops
        try:
            with open(_FLOPS_CACHE_FILE, "w") as f:
                json.dump(cache, f)
        except OSError:
            pass
    return flops * scan_steps


def _mfu(flops: float, dt: float) -> float:
    """Model FLOPs utilization vs this chip's peak (VERDICT r2 #7)."""
    import jax

    peak = PEAK_FLOPS.get(jax.devices()[0].platform)
    if not peak or flops <= 0.0 or dt <= 0.0:
        return 0.0
    return flops / dt / peak


def _steps_per_sec(image_size: int, batch: int, timesteps: int,
                   precision: str, repeats: int = 2,
                   mfu_out: dict = None) -> float:
    import jax

    run, params, cond = _build_sampler(image_size, batch, timesteps, precision)
    rng = jax.random.PRNGKey(1)
    float(run(params, cond, rng))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(params, cond, rng))  # host readback forces completion
        best = min(best, time.perf_counter() - t0)
    if mfu_out is not None:
        mfu_out["mfu"] = round(_mfu(
            _xla_flops(run, params, cond, rng, scan_steps=timesteps,
                       key=f"sampler-{image_size}x{batch}-{precision}"),
            best), 4)
    return timesteps / best


def _make_algo(image_size: int, timesteps: int, precision: str,
               sampling_timesteps=None, remat: bool = False):
    from opticalflowdiffusion_tpu.algorithms.flow_diffuser import FlowDiffuser
    from opticalflowdiffusion_tpu.config import compose

    overrides = [
        "experiment=matrix_flow",
        "dataset=artificial",
        "algorithm=flow_diffuser",
        f"algorithm.image_size={image_size}",
        f"algorithm.timesteps={timesteps}",
        f"+algorithm._precision={precision}",
    ]
    if sampling_timesteps:
        overrides.append(f"algorithm.sampling_timesteps={sampling_timesteps}")
    if remat:
        overrides.append("+algorithm._remat=true")
    return FlowDiffuser(compose(overrides).algorithm)


def _train_samples_per_sec(image_size: int, batch: int, timesteps: int,
                           precision: str, steps: int = 10,
                           H: int = None, W: int = None,
                           remat: bool = False) -> float:
    """Full train step (loss + grads + Adam) samples/sec, synthetic batch.
    H, W override the square image_size batch shape (e.g. 256x512 for the
    full-res Sintel train row, smoke-ladder step 3; 448x1024 + remat for
    the native-res row)."""
    import jax
    import numpy as np

    from opticalflowdiffusion_tpu.parallel import mesh as meshlib
    from opticalflowdiffusion_tpu.parallel.train import make_train_step

    algo = _make_algo(image_size, timesteps, precision, remat=remat)
    H = H or image_size
    W = W or image_size
    rng = np.random.default_rng(0)
    batch_np = (
        rng.standard_normal((batch, H, W, 3)).astype("float32"),
        rng.standard_normal((batch, H, W, 3)).astype("float32"),
        rng.standard_normal((batch, H, W, 2)).astype("float32"),
    )
    mesh = meshlib.make_mesh()
    key = jax.random.PRNGKey(0)
    state = algo.init(key, batch_np, clip=100)
    step = make_train_step(algo.loss_fn, mesh)
    gbatch = meshlib.shard_batch(mesh, batch_np)
    # two warm calls: compile, then prove steady-state (a sharding mismatch
    # between them would recompile — guarded against in make_train_step)
    state, m = step(state, gbatch, key)
    float(m["train/loss"])
    state, m = step(state, gbatch, key)
    float(m["train/loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, m = step(state, gbatch, sub)
    float(m["train/loss"])
    dt = (time.perf_counter() - t0) / steps
    return batch / dt


def _video_train_samples_per_sec(precision: str, image_size: int = 256,
                                 batch: int = 8, steps: int = 6) -> float:
    """Multi-frame video diffusion at 256^2 (BASELINE.md smoke-ladder step
    5): FrameGenerator (next-frame DDPM conditioned on last frame + flow)
    full train step samples/sec."""
    import jax
    import numpy as np

    from opticalflowdiffusion_tpu.algorithms.animation import FrameGenerator
    from opticalflowdiffusion_tpu.config import Config
    from opticalflowdiffusion_tpu.parallel import mesh as meshlib
    from opticalflowdiffusion_tpu.parallel.train import make_train_step

    algo = FrameGenerator(Config(dict(
        name="frame_generator", image_size=image_size, lr=1e-5,
        weight_decay=1e-6, val_length=2, _precision=precision,
    )))
    rng = np.random.default_rng(0)
    stack = rng.standard_normal(
        (batch, image_size, image_size, 8)
    ).astype("float32")
    batch_np = (stack,)
    mesh = meshlib.make_mesh()
    key = jax.random.PRNGKey(0)
    state = algo.init(key, batch_np, clip=100)
    step = make_train_step(algo.loss_fn, mesh)
    gbatch = meshlib.shard_batch(mesh, batch_np)
    state, m = step(state, gbatch, key)
    float(m["train/loss"])
    state, m = step(state, gbatch, key)
    float(m["train/loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, m = step(state, gbatch, sub)
    float(m["train/loss"])
    dt = (time.perf_counter() - t0) / steps
    return batch / dt


def _flow_learner_train_samples_per_sec(precision: str = "float32",
                                        image_size: int = 128, batch: int = 16,
                                        steps: int = 6) -> float:
    """Unsupervised FlowLearner full train step (UNet + phase-interleaved
    photometric pyramid, ops/pyramid.py) samples/sec.  Per-step host sync:
    deep async enqueue through the device tunnel serializes with multi-second
    queue latency and would inflate the measurement ~10x."""
    import jax
    import numpy as np

    from opticalflowdiffusion_tpu.algorithms.flow_learner import FlowLearner
    from opticalflowdiffusion_tpu.config import compose
    from opticalflowdiffusion_tpu.parallel import mesh as meshlib
    from opticalflowdiffusion_tpu.parallel.train import make_train_step

    cfg = compose([
        "experiment=matrix_flow",
        "dataset=artificial",
        "algorithm=flow_learner",
        f"algorithm.image_size={image_size}",
        f"+algorithm._precision={precision}",
    ])
    algo = FlowLearner(cfg.algorithm)
    rng = np.random.default_rng(0)
    batch_np = tuple(
        rng.standard_normal((batch, image_size, image_size, c)).astype("float32")
        for c in (3, 3, 2)
    )
    mesh = meshlib.make_mesh()
    key = jax.random.PRNGKey(0)
    state = algo.init(key, batch_np, clip=100)
    step = make_train_step(algo.loss_fn, mesh)
    gbatch = meshlib.shard_batch(mesh, batch_np)
    state, m = step(state, gbatch, key)
    float(m["train/loss"])
    best = float("inf")
    for _ in range(steps):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, m = step(state, gbatch, sub)
        float(m["train/loss"])
        best = min(best, time.perf_counter() - t0)
    return batch / best


# UNet params have no H/W/batch dependence (convs + channel-wise norms +
# attention projections only), so every sampling row can share ONE init
# done at a small shape — the per-row init program load/exec through the
# tunnel was a measured ~20-40 s/row of the round-5 full-bench walls.
_PARAMS_CACHE: dict = {}


def _shared_params(algo, precision: str):
    import jax
    import jax.numpy as jnp

    key = (precision, algo.channels)
    if key not in _PARAMS_CACHE:
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((1, 64, 64, algo.channels), jnp.float32)
        cond = jnp.zeros((1, 64, 64, 3), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        _PARAMS_CACHE[key] = jax.jit(algo.module.init)(
            rng, x, cond, t, None
        )["params"]
    return _PARAMS_CACHE[key]


def _sintel_ddim_frames_per_sec(precision: str, batch: int = 2,
                                ddim_steps: int = 50,
                                H: int = 256, W: int = 512,
                                sampler: str = "ddim",
                                mfu_out: dict = None,
                                repeats: int = 2) -> float:
    """Sintel few-step sampling frames/sec.  Default H, W is the
    reference config resolution (dataset/sintel.yaml 512x256); pass
    H=448, W=1024 for the native 1024x436 frame padded to the UNet's /8
    divisibility (BASELINE.md "frames/sec (436x1024)" row).  sampler=
    'dpmpp' measures the DPM-Solver++(2M) serving path (same per-step
    cost; ~2.5x fewer steps at matched quality)."""
    import jax
    import jax.numpy as jnp

    from opticalflowdiffusion_tpu.models import diffusion as dm

    algo = _make_algo(128, 1000, precision, sampling_timesteps=ddim_steps)
    rng = jax.random.PRNGKey(0)
    cond = jnp.zeros((batch, H, W, 3), jnp.float32)
    params = _shared_params(algo, precision)

    from opticalflowdiffusion_tpu.utils import xla_opts

    sample_fn = dm.dpmpp_sample if sampler == "dpmpp" else dm.ddim_sample

    @functools.partial(jax.jit, compiler_options=xla_opts.compiler_options())
    def run(params, cond, rng):
        img, _ = sample_fn(
            algo.sched, algo._model_fn(params), rng,
            (batch, H, W, algo.channels), external_cond=cond,
        )
        return jnp.sum(img.astype(jnp.float32))

    float(run(params, cond, rng))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(params, cond, rng))
        best = min(best, time.perf_counter() - t0)
    if mfu_out is not None:
        # both ddim and dpmpp run one model eval per scanned step
        mfu_out["mfu"] = round(_mfu(
            _xla_flops(run, params, cond, rng, scan_steps=ddim_steps,
                       key=f"{sampler}-{H}x{W}x{batch}-{precision}"),
            best), 4)
    return batch / best


def _cpu_baseline(image_size: int, batch: int) -> float:
    key = f"scan-{image_size}x{batch}"
    cache = {}
    if os.path.exists(CPU_BASELINE_FILE):
        cache = json.load(open(CPU_BASELINE_FILE))
        if key in cache:
            return float(cache[key])
    import jax

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        sps = _steps_per_sec(image_size, batch, timesteps=2,
                             precision="float32", repeats=1)
    cache[key] = sps
    with open(CPU_BASELINE_FILE, "w") as f:
        json.dump(cache, f, indent=1)
    return sps


def _hbm_stream_gbps(passes: int = 100) -> float:
    """Measured effective HBM streaming bandwidth: ``passes`` chained
    read+write passes (y = y*c + d) over a 470 MB bf16 array inside one
    scan, one host readback.  Two traps found across rounds 4-5:
    (1) the body must be an FMA with TRACED scalars — the r4 ``y + 1``
    body let XLA fold consecutive passes (reported 1302 GB/s); (2) the
    buffer must be MUCH larger than the 128 MB VMEM — a 117 MB carry is
    kept VMEM-RESIDENT across scan iterations and reads 1000+ GB/s, above
    the chip's 819 GB/s HBM spec, which is impossible for HBM traffic.
    At 470 MB this runtime streams ~560 GB/s (~68% of spec), the honest
    roofline denominator.  The pass count must amortize the device-tunnel
    launch+readback latency (tens of ms — at 10 passes the round-3 number
    was launch-bound at "78 GB/s")."""
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((8, 448, 1024, 64), jnp.bfloat16)

    @jax.jit
    def run(x, c, d):
        def body(y, _):
            return y * c + d, None
        y, _ = jax.lax.scan(body, x, None, length=passes)
        return y[0, 0, 0, 0]

    c = jnp.bfloat16(1.0000152587890625)  # representable, != 1
    d = jnp.bfloat16(1e-3)
    float(run(x, c, d))  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(x, c, d))
        best = min(best, time.perf_counter() - t0)
    return x.size * 2 * 2 * passes / best / 1e9


def main():
    _setup_cache()
    image_size = int(os.environ.get("BENCH_IMAGE_SIZE", "128"))
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    timesteps = int(os.environ.get("BENCH_TIMESTEPS", "250"))
    precision = os.environ.get("BENCH_PRECISION", "bf16")
    sintel_b = int(os.environ.get("BENCH_SINTEL_BATCH", "2"))
    native_b = int(os.environ.get("BENCH_SINTEL_NATIVE_BATCH", "2"))

    headline_mfu = {}
    device_sps = _steps_per_sec(image_size, batch, timesteps, precision,
                                mfu_out=headline_mfu)

    try:
        cpu_sps = _cpu_baseline(image_size, batch)
        vs = round(device_sps / max(cpu_sps, 1e-9), 2)
    except Exception:
        vs = None

    extra = {"conv_backend": os.environ.get("OFD_CONV_BACKEND", "auto=xla")}
    if headline_mfu.get("mfu"):
        extra["mfu_headline"] = headline_mfu["mfu"]
    else:
        extra["mfu_headline_skipped_reason"] = _FLOPS_ERRORS.get(
            f"sampler-{image_size}x{batch}-{precision}", "flops=0")
    result = {
        "metric": "denoise_steps_per_sec_per_chip",
        "value": round(device_sps, 3),
        "unit": "steps/s",
        "vs_baseline": vs,
        "extra": extra,
    }
    # headline lands the moment it's measured; each row re-prints the
    # cumulative line so a timeout only loses not-yet-measured rows
    print(json.dumps(result), flush=True)
    if os.environ.get("BENCH_HEADLINE_ONLY") == "1":
        return

    native_mfu = {}

    def _native_row():
        v = round(_sintel_ddim_frames_per_sec(
            precision, batch=native_b, H=448, W=1024,
            mfu_out=native_mfu), 3)
        if native_mfu.get("mfu"):
            extra["mfu_native"] = native_mfu["mfu"]
        else:
            extra["mfu_native_skipped_reason"] = _FLOPS_ERRORS.get(
                f"ddim-448x1024x{native_b}-{precision}", "flops=0")
        return v

    # (name, thunk, worst-case WARM-cache seconds: build + init + measure
    # through the axon tunnel; measured round 5 with the per-row wall
    # logging below) — ordered by evidentiary priority (VERDICT r3 #1/#3
    # rows first).  Heavy sampling rows measure warm + ONE timed call
    # (repeats=1): their scanned programs are minutes of device work per
    # call, where run-to-run variance is far below the tunnel noise floor.
    rows = [
        ("sintel_native_ddim50_frames_per_sec", _native_row, 75),
        # native-res THROUGHPUT row: same program at batch 8 — the thin-b2
        # lowering inefficiency is the native-res limiter (PERF.md r5:
        # utilization-bound, T(2,128) tiles), and batch amortizes it:
        # 0.284 (b2) -> 0.474 (b8), saturated by b16.  The b2 row above
        # stays as the latency-comparable BASELINE.md number.
        ("sintel_native_ddim50_b8_frames_per_sec",
         lambda: round(_sintel_ddim_frames_per_sec(
             precision, batch=8, H=448, W=1024, repeats=1), 3), 60),
        ("sintel_ddim50_frames_per_sec",
         lambda: round(_sintel_ddim_frames_per_sec(precision, batch=sintel_b,
                                                   repeats=1), 3), 35),
        ("train_samples_per_sec",
         lambda: round(_train_samples_per_sec(image_size, 16, timesteps,
                                              precision, steps=6), 2), 45),
        ("sintel_ddim50_b8_frames_per_sec",
         lambda: round(_sintel_ddim_frames_per_sec(precision, batch=8,
                                                   repeats=1), 3), 40),
        # serving path: DPM-Solver++(2M) at 20 steps tracks the ODE
        # solution as well as DDIM needs ~50+ for (tests/test_diffusion);
        # matched-quality evidence: parity r05 dpmpp stage (PARITY_r05.md)
        ("sintel_dpmpp20_b8_frames_per_sec",
         lambda: round(_sintel_ddim_frames_per_sec(
             precision, batch=8, ddim_steps=20, sampler="dpmpp",
             repeats=1), 3), 35),
        ("sintel_train_samples_per_sec",
         lambda: round(_train_samples_per_sec(
             image_size, 16, timesteps, precision, steps=4,
             H=256, W=512), 2), 50),
        # native-res SERVING path: DPM-Solver++(2M), 20 steps at matched
        # quality (models/diffusion.py::dpmpp_sample)
        ("sintel_native_dpmpp20_frames_per_sec",
         lambda: round(_sintel_ddim_frames_per_sec(
             precision, batch=native_b, ddim_steps=20,
             H=448, W=1024, sampler="dpmpp", repeats=1), 3), 50),
        # native-res TRAINING (remat path, algorithms/flow_diffuser.py
        # _remat — the config the rematerialization exists for)
        ("sintel_native_train_samples_per_sec",
         lambda: round(_train_samples_per_sec(
             image_size, 2, timesteps, precision, steps=3,
             H=448, W=1024, remat=True), 3), 60),
        ("video256_train_samples_per_sec",
         lambda: round(_video_train_samples_per_sec(precision, steps=4), 2),
         45),
        ("flow_learner_train_samples_per_sec",
         lambda: round(_flow_learner_train_samples_per_sec(steps=4), 2), 45),
        ("flow_learner_bf16_train_samples_per_sec",
         lambda: round(_flow_learner_train_samples_per_sec(precision,
                                                           steps=4), 2), 45),
        # measured effective HBM streaming bandwidth (fold-proof FMA scan
        # over a 470 MB array — see _hbm_stream_gbps for the two traps) —
        # the roofline denominator for PERF.md
        ("hbm_stream_gbps", lambda: round(_hbm_stream_gbps(), 1), 20),
    ]
    for name, thunk, est in rows:
        if _remaining() < est:
            extra[name + "_skipped"] = True
        else:
            t_row = time.monotonic()
            try:
                extra[name] = thunk()
            except Exception as e:  # a row must never sink the headline
                extra[name + "_error"] = repr(e)[:200]
            if os.environ.get("BENCH_DEBUG") == "1":
                extra[name + "_wall_s"] = round(time.monotonic() - t_row, 1)
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
