"""Benchmark suite over the five BASELINE.json configs.

Each config prints one JSON line; ``python benchmarks/run_suite.py --configs all``
runs everything (slow: several axon compiles). The driver-facing headline
stays in ``bench.py``.

Configs (BASELINE.md):
  gatys256    — Gatys IST, single pair, 256², 300 L-BFGS iters
  gatys_hr    — coarse-to-fine 512 → 1024² (300 + 500 iters)
  cyclegan256 — CycleGAN 256² unpaired TRAINING step (9-block ResNet G +
                70×70 PatchGAN, batch 4 like the reference)
  p2phd512    — pix2pixHD global 512² paired training step w/ VGG feature
                matching
  p2phd1024   — pix2pixHD global+local 1024², 3-scale discriminators
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax
    import jax.numpy as jnp

    return float(jnp.sum(jax.tree.leaves(x)[0]))


# Public v5e per-chip peaks: 197 TFLOP/s bf16 matmul, 394 TOP/s int8.
# fp32 rows are measured against the bf16 peak (v5e has no separate fp32
# matmul unit — fp32 convs run as multi-pass bf16, so MFU reads low there
# by construction; the note field says so).
V5E_PEAK = {"bf16": 197e12, "fp32": 197e12, "int8": 394e12}


def _flops_of(jitted, *args) -> float:
    """FLOPs of one call from XLA's cost model. The compile behind
    ``.lower().compile()`` is served by the persistent compilation cache
    when the measurement loop already built the same program."""
    try:
        compiled = jitted.lower(*args).compile()
        costs = compiled.cost_analysis()
        if isinstance(costs, list):
            costs = costs[0] if costs else {}
        return float((costs or {}).get("flops", 0.0))
    except Exception:
        return 0.0


_CODE_REV = None


def _code_rev() -> str:
    """Content hash over every cistar_tpu source file. Executable-cache keys
    include it so ANY engine/op code change invalidates the cached binaries
    (the bench.py ENGINE_REV lesson, generalized: a manually-bumped constant
    is too easy to forget)."""
    global _CODE_REV
    if _CODE_REV is None:
        import hashlib

        root = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "cistar_tpu")
        h = hashlib.sha256()
        for dirpath, _, names in sorted(os.walk(root)):
            for n in sorted(names):
                if n.endswith(".py"):
                    with open(os.path.join(dirpath, n), "rb") as f:
                        h.update(f.read())
        _CODE_REV = h.hexdigest()[:12]
    return _CODE_REV


def _flops_sidecar(key: str, compute):
    """FLOPs for a cached executable. ``Compiled.cost_analysis`` is not
    available on a deserialized executable, so the fresh-compile run stores
    the number in a JSON sidecar next to the executable cache and warm runs
    read it back instead of recompiling just for the cost model."""
    import json as _json

    path = os.path.join(os.path.expanduser("~/.cache/cistar_tpu"),
                        "suite_flops.json")
    try:
        with open(path) as f:
            table = _json.load(f)
    except Exception:
        table = {}
    if key in table:
        return float(table[key])
    flops = compute()
    if flops:
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            table[key] = flops
            tmp = f"{path}.tmp{os.getpid()}"
            with open(tmp, "w") as f:
                _json.dump(table, f)
            os.replace(tmp, path)
        except Exception:
            pass
    return flops


def _env_rev() -> str:
    """Experimental kernel-path env flags must key the executable cache, or
    a flag flip would silently reload the previous configuration's binary
    (same rule as bench.py)."""
    return (f":in{os.environ.get('CISTAR_FUSED_STAGE_IN', '0')}"
            f":hd{os.environ.get('CISTAR_HEAD_KERNEL', '-')}")


def _cost_flops(compiled) -> float:
    try:
        costs = compiled.cost_analysis()
        if isinstance(costs, list):
            costs = costs[0] if costs else {}
        return float((costs or {}).get("flops", 0.0))
    except Exception:  # deserialized executables don't carry the cost model
        return 0.0


def _cached_step(eng, key: str, *args):
    """Compile ``type(eng).train_step(eng, *args)`` through the disk-backed
    EXECUTABLE cache (``core.cache``), so warm suite re-runs skip the
    98–248 s train-step compiles (VERDICT r4 #7). Returns
    ``(step_over_dynamic_args, flops_per_call)``: on a fresh compile the
    FLOPs come from the compiled object's cost model and are persisted to a
    sidecar; on a warm (deserialized) run they come back from the sidecar —
    no recompile just for the cost model. Falls back to the plain jitted
    method on any cache failure so a bench run never breaks on cache
    trouble."""
    full_key = f"{key}:{_code_rev()}{_env_rev()}"
    try:
        from cistar_tpu.core.cache import exec_cache_compile

        compiled = exec_cache_compile(type(eng).train_step, (eng, *args),
                                      key=full_key, verbose=False)
        step = lambda *a: compiled(*a)  # noqa: E731
    except Exception:
        compiled = None
        step = lambda *a: type(eng).train_step(eng, *a)  # noqa: E731
    # a deserialized executable has no cost model; if the sidecar is also
    # gone, pay one _flops_of recompile and re-persist rather than lose MFU
    flops = _flops_sidecar(key, lambda: (
        (_cost_flops(compiled) if compiled is not None else 0.0)
        or _flops_of(type(eng).train_step, eng, *args)))
    return step, flops


def _cached_jit(fn, key: str, *args):
    """Same treatment for the suite's jitted inference fns. Returns
    ``(fn_over_args, flops_per_call)`` with the same sidecar discipline as
    :func:`_cached_step`."""
    full_key = f"{key}:{_code_rev()}{_env_rev()}"
    try:
        from cistar_tpu.core.cache import exec_cache_compile

        compiled = exec_cache_compile(fn, args, key=full_key, verbose=False)
        wrapped = lambda *a: compiled(*a)  # noqa: E731
    except Exception:
        compiled = None
        wrapped = fn
    flops = _flops_sidecar(key, lambda: (
        (_cost_flops(compiled) if compiled is not None else 0.0)
        or _flops_of(fn, *args)))
    return wrapped, flops


def _mfu_fields(flops_per_call: float, items_per_call: float,
                sec_per_call: float, engine: str = "bf16",
                note: str = ""):
    """Machine-checked efficiency stamp for a suite row: algorithmic FLOPs,
    achieved TFLOP/s, and MFU against the v5e per-chip peak (VERDICT r3 #5:
    every row must prove its efficiency, not leave it to hand estimates)."""
    out = {}
    if note:
        out["mfu_note"] = note
    if flops_per_call <= 0 or sec_per_call <= 0:
        out.setdefault("mfu_note", "XLA cost model returned no flops")
        return out
    achieved = flops_per_call / sec_per_call
    out.update({
        "flops_per_item": flops_per_call / max(items_per_call, 1e-9),
        "achieved_tflops": round(achieved / 1e12, 2),
        "mfu": round(achieved / V5E_PEAK[engine], 4),
        "mfu_peak": f"{engine}:{V5E_PEAK[engine] / 1e12:.0f}e12",
    })
    return out


def _no_baseline(reason: str):
    """The reference publishes no number for this config (BASELINE.md) —
    an explicit null + reason instead of a misleading 0.0/target ratio."""
    return {"vs_baseline": None, "baseline_note": reason}


def bench_gatys(size: int, iters: int, hr: bool = False):
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.core.config import get_ist_cfg_defaults
    from cistar_tpu.engines.ist import GatysEngine
    from cistar_tpu.models import vgg as vgg_lib

    cfg = get_ist_cfg_defaults()
    cfg.DATA.IMG_SIZE = size
    rng = np.random.RandomState(0)
    eng = GatysEngine(cfg, vgg_lib.init_vgg_params(seed=0),
                      compute_dtype=jnp.bfloat16)
    content = jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32) * 255 - 120)
    style = jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32) * 255 - 120)
    out, _, _ = eng.optimize(content, style, max_iters=iters)  # compile
    _sync(out)
    t0 = time.perf_counter()
    out, _, _ = eng.optimize(content, style, max_iters=iters)
    _sync(out)
    dt = time.perf_counter() - t0
    # XLA's cost model counts a lax.scan/while body ONCE; the L-BFGS loop
    # runs `iters` trips, so scale to get true per-run FLOPs.
    flops = iters * _flops_of(eng._compiled[(content.shape, iters)],
                              eng.vgg_params, content, style, content)
    if hr:
        hr_size = size * 2
        up = jnp.asarray(np.repeat(np.repeat(np.asarray(out), 2, 1), 2, 2))
        hr_c = jnp.asarray(rng.rand(1, hr_size, hr_size, 3)
                           .astype(np.float32) * 255 - 120)
        hr_s = jnp.asarray(rng.rand(1, hr_size, hr_size, 3)
                           .astype(np.float32) * 255 - 120)
        hr_out, _, _ = eng.optimize(hr_c, hr_s, init_image=up, max_iters=500)
        _sync(hr_out)
        t0 = time.perf_counter()
        hr_out, _, _ = eng.optimize(hr_c, hr_s, init_image=up, max_iters=500)
        _sync(hr_out)
        dt_hr = time.perf_counter() - t0
        flops += 500 * _flops_of(eng._compiled[(hr_c.shape, 500)],
                                 eng.vgg_params, hr_c, hr_s, up)
        return {"metric": f"gatys_{size}to{hr_size}_coarse2fine_seconds",
                "value": round(dt + dt_hr, 3), "unit": "s",
                "lr_pass_s": round(dt, 3), "hr_pass_s": round(dt_hr, 3),
                **_no_baseline("the <5 s target is the 512-sq single-pass "
                               "config; no published coarse-to-fine number"),
                **_mfu_fields(flops, 1, dt + dt_hr)}
    row = {"metric": f"gatys_{size}sq_{iters}iter_seconds",
           "value": round(dt, 3), "unit": "s",
           **_mfu_fields(flops, 1, dt)}
    if size == 512 and iters == 300:  # the BASELINE.json <5 s target config
        row["vs_baseline"] = round(5.0 / max(dt, 1e-9), 3)
    else:
        row.update(_no_baseline("the <5 s target is the 512-sq 300-iter "
                                "config only"))
    return row


def bench_gatys_batch(size: int = 512, frames: int = 4, iters: int = 300):
    """Batched directory sweep (``ist_main --frames_per_batch``): F
    independent L-BFGS runs vmapped into ONE program vs the per-frame
    sweep the reference performs (``IST/main.py:186-238``)."""
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.core.config import get_ist_cfg_defaults
    from cistar_tpu.engines.ist import GatysEngine
    from cistar_tpu.models import vgg as vgg_lib

    cfg = get_ist_cfg_defaults()
    cfg.DATA.IMG_SIZE = size
    rng = np.random.RandomState(0)
    eng = GatysEngine(cfg, vgg_lib.init_vgg_params(seed=0),
                      compute_dtype=jnp.bfloat16)
    contents = jnp.asarray(
        rng.rand(frames, 1, size, size, 3).astype(np.float32) * 255 - 120)
    styles = jnp.broadcast_to(contents[:1] * 0.5, contents.shape)
    # single-frame reference point (one compiled program, warm)
    out, _, _ = eng.optimize(contents[0], styles[0], max_iters=iters)
    _sync(out)
    t0 = time.perf_counter()
    out, _, _ = eng.optimize(contents[0], styles[0], max_iters=iters)
    _sync(out)
    single_s = time.perf_counter() - t0
    # batched program
    outs, _, _ = eng.optimize_batch(contents, styles, max_iters=iters)
    _sync(outs)
    t0 = time.perf_counter()
    outs, _, _ = eng.optimize_batch(contents, styles, max_iters=iters)
    _sync(outs)
    dt = time.perf_counter() - t0
    flops = iters * _flops_of(eng._compiled[("batch", contents.shape, iters)],
                              contents, styles, contents)
    return {"metric": f"gatys_{size}sq_batch{frames}_frames_per_sec",
            "value": round(frames / dt, 3), "unit": "frames/sec/chip",
            **_no_baseline("reference sweeps one frame at a time; "
                           "single_frame_s is this run's own reference"),
            "single_frame_s": round(single_s, 3),
            "aggregate_speedup": round(frames / dt * single_s, 2),
            **_mfu_fields(flops, frames, dt)}


def bench_cyclegan_family_infer(gen_type: str, size: int = 512,
                                batch: int = 32, iters: int = 10,
                                dense: bool = True, in_features: int = 16):
    """bf16 vs int8 inference for the non-ResNet CycleGAN families
    (VERDICT r3 #3: bilinear_content — the CLI default — and atrous_dense;
    the reference's TRT int8 tier is family-agnostic)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.models import fast_infer as fi
    from cistar_tpu.models.cyclegan import build_generator

    model = build_generator(gen_type, output_nc=1, in_features=in_features,
                            n_residual_blocks=6, dense_decoder=dense)
    rng = np.random.RandomState(0)
    x0 = jnp.zeros((1, size, size, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0)["params"]
    if gen_type.startswith("bilinear"):
        q = fi.quantize_bilinear_trunk(params, 6)
        int8_apply = lambda p, qb, x: fi.bilinear_generator_int8_trunk_apply(
            p, qb, x, 6, expect_kernel=True)
    else:
        q = fi.quantize_multiscale_trunk(params, 6)
        int8_apply = lambda p, qb, x: fi.multiscale_generator_int8_trunk_apply(
            p, qb, x, 6, dense_decoder=dense, expect_kernel=True)

    @jax.jit
    def infer_bf16(p, x):
        return model.apply({"params": p},
                           x.astype(jnp.bfloat16)).astype(jnp.float32)

    @jax.jit
    def infer_int8(p, qb, x):
        return int8_apply(p, qb, x.astype(jnp.bfloat16)).astype(jnp.float32)

    bx = jnp.asarray(rng.rand(batch, size, size, 1).astype(np.float32) * 2 - 1)
    infer_bf16, flops = _cached_jit(infer_bf16,
                                    f"fam_bf16:{gen_type}:{size}:{dense}",
                                    params, bx)
    infer_int8, _ = _cached_jit(infer_int8,
                                f"fam_int8:{gen_type}:{size}:{dense}",
                                params, q, bx)

    def measure(f, *extra):
        x = f(*extra, bx)
        _sync(x)
        x = f(*extra, x)
        _sync(x)
        t0 = time.perf_counter()
        for _ in range(iters):
            x = f(*extra, x)
        _sync(x)
        return batch * iters / (time.perf_counter() - t0)

    bf16 = measure(infer_bf16, params)
    ips = measure(infer_int8, params, q)
    tag = "dense" if (dense and gen_type.startswith("atrous")) else ""
    return {"metric": f"cyclegan_{gen_type}{tag}_{size}sq_int8_infer_"
                      "throughput",
            "value": round(ips, 1), "unit": "images/sec/chip",
            **_no_baseline("reference publishes no TRT throughput"),
            "speedup_vs_bf16": round(ips / max(bf16, 1e-9), 3),
            "bf16_img_s": round(bf16, 1),
            **_mfu_fields(flops, batch, batch / ips, engine="int8",
                          note="algorithmic FLOPs from the bf16 program")}


def bench_cyclegan_train(size: int = 256, batch: int = 4, iters: int = 10):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.engines.cyclegan import CycleGAN

    eng = CycleGAN(gen_type="p2p", in_features=64, n_residual_blocks=9,
                   image_size=size, batch_size=batch, min_points=1.0)
    state = eng.init_state(jax.random.PRNGKey(0), image_size=size)
    rng = np.random.RandomState(0)
    a = jnp.asarray(np.sign(rng.randn(batch, size, size, 1)).astype(np.float32))
    b = jnp.asarray(np.sign(rng.randn(batch, size, size, 1)).astype(np.float32))
    step, flops = _cached_step(eng, f"suite_cyclegan:{size}:{batch}",
                               state, a, b)
    state, m = step(state, a, b)
    _sync(m)
    state, m = step(state, a, b)
    _sync(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, a, b)
    _sync(m)
    dt = (time.perf_counter() - t0) / iters
    return {"metric": f"cyclegan_{size}sq_train_step_images_per_sec",
            "value": round(batch / dt, 1), "unit": "images/sec/chip",
            **_no_baseline("reference publishes no training throughput"),
            **_mfu_fields(flops, batch, dt)}


def bench_p2phd_train(size: int, net_g: str, num_d: int, iters: int = 5,
                      compute_dtype=None):
    import time as _t

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.engines.p2phd import Pix2PixHD
    from cistar_tpu.losses.perceptual import make_vgg_loss

    t_compile = _t.perf_counter()
    if isinstance(compute_dtype, str):
        compute_dtype = getattr(jnp, compute_dtype)
    kw = {} if compute_dtype is None else {"compute_dtype": compute_dtype}
    if net_g == "UNet":  # the shipped r2l_MSRB recipe: 3 MSRB stages
        kw["n_blocks_global"] = 3
    eng = Pix2PixHD(net_g=net_g, ngf=32 if net_g == "local" else 64,
                    num_d=num_d, image_size=size,
                    vgg_criterion=make_vgg_loss() if net_g == "global" else None,
                    **kw)
    state = eng.init_state(jax.random.PRNGKey(0), image_size=size)
    rng = np.random.RandomState(0)
    label = jnp.asarray(rng.rand(1, size, size, 1).astype(np.float32) * 2 - 1)
    image = jnp.asarray(rng.rand(1, size, size, 1).astype(np.float32) * 2 - 1)
    mfu_engine = "fp32" if compute_dtype == jnp.float32 else "bf16"
    key = f"suite_p2phd:{net_g}:{size}:{num_d}:{mfu_engine}"
    step, flops = _cached_step(eng, key, state, label, None, image)
    state, m, _ = step(state, label, None, image)
    _sync(m)
    compile_s = round(_t.perf_counter() - t_compile, 1)
    state, m, _ = step(state, label, None, image)
    _sync(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m, _ = step(state, label, None, image)
    _sync(m)
    dt = (time.perf_counter() - t0) / iters
    tag = "_fp32" if mfu_engine == "fp32" else ""
    return {"metric": f"p2phd_{net_g}_{size}sq_train_step_seconds{tag}",
            "value": round(dt, 4), "unit": "s/step",
            **_no_baseline("reference publishes no training throughput"),
            **_mfu_fields(flops, 1, dt, engine=mfu_engine,
                          note="fp32 rows measured against the bf16 peak"
                          if mfu_engine == "fp32" else ""),
            "first_step_compile_s": compile_s}


def bench_p2phd_infer(size: int = 512, batch: int = 16, iters: int = 10,
                      engine: str = "int8", ngf: int = 64,
                      n_downsampling: int = 4):
    """GlobalGenerator inference throughput — the reference's TRT engine
    workload (``run_engine.py:160-165``), bf16 XLA vs the int8 tiled-trunk
    megakernel path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.models.fast_infer import global_generator_int8_trunk_apply
    from cistar_tpu.models.pix2pixhd import GlobalGenerator
    from cistar_tpu.ops.quant_pallas import quantize_global_trunk

    model = GlobalGenerator(output_nc=1, ngf=ngf,
                            n_downsampling=n_downsampling, n_blocks=9)
    rng = np.random.RandomState(0)
    x0 = jnp.zeros((1, size, size, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0)["params"]
    qblocks = quantize_global_trunk(params, 9)

    @jax.jit
    def infer_bf16(p, x):
        return model.apply({"params": p},
                           x.astype(jnp.bfloat16)).astype(jnp.float32)

    @jax.jit
    def infer_int8(p, q, x):
        return global_generator_int8_trunk_apply(
            p, q, x.astype(jnp.bfloat16),
            n_downsampling=n_downsampling).astype(jnp.float32)

    batch_x = jnp.asarray(rng.rand(batch, size, size, 1)
                          .astype(np.float32) * 2 - 1)
    infer_bf16, flops = _cached_jit(
        infer_bf16, f"p2phd_inf_bf16:{size}:{ngf}:{n_downsampling}",
        params, batch_x)
    infer_int8, _ = _cached_jit(
        infer_int8, f"p2phd_inf_int8:{size}:{ngf}:{n_downsampling}",
        params, qblocks, batch_x)

    def measure(f, *extra):
        x = f(*extra, batch_x)
        _sync(x)
        x = f(*extra, x)
        _sync(x)
        t0 = time.perf_counter()
        for _ in range(iters):
            x = f(*extra, x)
        _sync(x)
        return batch * iters / (time.perf_counter() - t0)

    bf16 = measure(infer_bf16, params)
    if engine == "int8":
        ips = measure(infer_int8, params, qblocks)
    else:
        ips = bf16
    return {"metric": f"p2phd_global_{size}sq_{engine}_infer_throughput",
            "value": round(ips, 1), "unit": "images/sec/chip",
            **_no_baseline("reference publishes no TRT throughput"),
            "speedup_vs_bf16": round(ips / max(bf16, 1e-9), 3),
            "bf16_img_s": round(bf16, 1),
            **_mfu_fields(flops, batch, batch / ips, engine=engine,
                          note="algorithmic FLOPs from the bf16 program "
                          "(pallas int8 kernels are opaque to the XLA "
                          "cost model)" if engine == "int8" else "")}


CONFIGS = {
    "gatys256": lambda: bench_gatys(256, 300),
    # the north-star config: 512² full 300-iter optimization, <5 s target
    "gatys512": lambda: bench_gatys(512, 300),
    "gatys_hr": lambda: bench_gatys(512, 300, hr=True),
    # batched directory sweep (VERDICT r3 #2): >=2x aggregate vs single-frame
    "gatys512_batch4": lambda: bench_gatys_batch(512, 4, 300),
    "cyclegan256": lambda: bench_cyclegan_train(256, 4),
    "p2phd512": lambda: bench_p2phd_train(512, "global", 2),
    "p2phd1024": lambda: bench_p2phd_train(1024, "local", 3),
    "p2phd512_int8": lambda: bench_p2phd_infer(512, engine="int8"),
    "unet512_int8": lambda: bench_unet_infer(512),
    # the shipped r2l_MSRB_7 recipe at its true resolution — bf16 compute
    # (the shipped default since r5; parity: benchmarks/bf16_train_overlay)
    "unet512_train": lambda: bench_p2phd_train(512, "UNet", 2, iters=3),
    # fp32 opt-out of the same recipe, kept for the bf16-vs-fp32 record
    "unet512_train_fp32": lambda: bench_p2phd_train(
        512, "UNet", 2, iters=3, compute_dtype="float32"),
    "p2phd1024_int8": lambda: bench_local_infer(1024),
    # the remaining CycleGAN int8 families (VERDICT r3 #3)
    "bilinear512_int8": lambda: bench_cyclegan_family_infer(
        "bilinear_content", 512),
    "atrousdense512_int8": lambda: bench_cyclegan_family_infer(
        "atrous_content", 512, dense=True),
}


def bench_local_infer(size: int = 1024, batch: int = 4, iters: int = 10):
    """LocalEnhancer (coarse-to-fine 1024² generator) — bf16 XLA vs the
    int8-global-trunk path (enhancer stream stays bf16: bandwidth-bound)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.models.fast_infer import (local_enhancer_int8_apply,
                                              quantize_local_enhancer)
    from cistar_tpu.models.pix2pixhd import LocalEnhancer

    m = LocalEnhancer(output_nc=1, ngf=32)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 64, 64, 1)))["params"]
    q = quantize_local_enhancer(params)
    rng = np.random.RandomState(0)
    bx = jnp.asarray(rng.rand(batch, size, size, 1).astype(np.float32) * 2 - 1)

    @jax.jit
    def infer_bf16(p, x):
        return m.apply({"params": p},
                       x.astype(jnp.bfloat16)).astype(jnp.float32)

    @jax.jit
    def infer_int8(p, qb, x):
        return local_enhancer_int8_apply(
            p, qb, x.astype(jnp.bfloat16)).astype(jnp.float32)

    infer_bf16, flops = _cached_jit(infer_bf16, f"local_inf_bf16:{size}",
                                    params, bx)
    infer_int8, _ = _cached_jit(infer_int8, f"local_inf_int8:{size}",
                                params, q, bx)

    def measure(f, *extra):
        x = f(*extra, bx)
        _sync(x)
        x = f(*extra, x)
        _sync(x)
        t0 = time.perf_counter()
        for _ in range(iters):
            x = f(*extra, x)
        _sync(x)
        return batch * iters / (time.perf_counter() - t0)

    bf16 = measure(infer_bf16, params)
    ips = measure(infer_int8, params, q)
    return {"metric": f"p2phd_local_{size}sq_int8_infer_throughput",
            "value": round(ips, 1), "unit": "images/sec/chip",
            **_no_baseline("reference publishes no TRT throughput"),
            "speedup_vs_bf16": round(ips / max(bf16, 1e-9), 3),
            "bf16_img_s": round(bf16, 1),
            **_mfu_fields(flops, batch, batch / ips, engine="int8",
                          note="algorithmic FLOPs from the bf16 program")}


def bench_unet_infer(size: int = 512, batch: int = 8, iters: int = 10):
    """UNet-MSRB inference (the shipped r2l deployment model) — bf16 XLA vs
    the int8 MSRB-trunk megakernel path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.models.fast_infer import (quantize_unet_msrb,
                                              unet_msrb_int8_apply)
    from cistar_tpu.models.pix2pixhd import UNetGeneratorHD

    m = UNetGeneratorHD(output_nc=1, n_residual_blocks=3, in_features=64)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, size, size, 1)))["params"]
    q = quantize_unet_msrb(params, 3)
    rng = np.random.RandomState(0)
    bx = jnp.asarray(rng.rand(batch, size, size, 1).astype(np.float32) * 2 - 1)

    @jax.jit
    def infer_bf16(p, x):
        return m.apply({"params": p},
                       x.astype(jnp.bfloat16)).astype(jnp.float32)

    @jax.jit
    def infer_int8(p, qb, x):
        return unet_msrb_int8_apply(p, qb, x.astype(jnp.bfloat16),
                                    3).astype(jnp.float32)

    infer_bf16, flops = _cached_jit(infer_bf16, f"unet_inf_bf16:{size}",
                                    params, bx)
    infer_int8, _ = _cached_jit(infer_int8, f"unet_inf_int8:{size}",
                                params, q, bx)

    def measure(f, *extra):
        x = f(*extra, bx)
        _sync(x)
        x = f(*extra, x)
        _sync(x)
        t0 = time.perf_counter()
        for _ in range(iters):
            x = f(*extra, x)
        _sync(x)
        return batch * iters / (time.perf_counter() - t0)

    bf16 = measure(infer_bf16, params)
    ips = measure(infer_int8, params, q)
    return {"metric": f"p2phd_unet_msrb_{size}sq_int8_infer_throughput",
            "value": round(ips, 1), "unit": "images/sec/chip",
            **_no_baseline("reference publishes no TRT throughput"),
            "speedup_vs_bf16": round(ips / max(bf16, 1e-9), 3),
            "bf16_img_s": round(bf16, 1),
            **_mfu_fields(flops, batch, batch / ips, engine="int8",
                          note="algorithmic FLOPs from the bf16 program")}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--configs", default="gatys256",
                   help="comma list or 'all': " + ",".join(CONFIGS))
    p.add_argument("--out", default="",
                   help="also write a JSON artifact (results + run metadata) "
                   "— the committed evidence for every number in the docs")
    args = p.parse_args(argv)
    from cistar_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    names = list(CONFIGS) if args.configs == "all" else args.configs.split(",")
    unknown = [n for n in names if n not in CONFIGS]
    if unknown:  # fail fast — a typo must not produce a green artifact
        p.error(f"unknown config(s) {unknown}; valid: {', '.join(CONFIGS)}")
    results = []
    for name in names:
        try:
            result = CONFIGS[name]()
        except Exception as e:  # record the failure, keep the suite going
            result = {"metric": name, "error": f"{type(e).__name__}: {e}"}
        result["config"] = name
        results.append(result)
        print(json.dumps(result), flush=True)
    if args.out:
        import datetime
        import subprocess

        import jax

        try:
            commit = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
                text=True, cwd=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))).stdout.strip()
        except Exception:
            commit = "unknown"
        artifact = {
            "commit": commit,
            "date": datetime.datetime.now().isoformat(timespec="seconds"),
            "device": str(jax.devices()[0]),
            "results": results,
        }
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
