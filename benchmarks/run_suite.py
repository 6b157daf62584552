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
    if hr:
        hr_size = size * 2
        up = jnp.asarray(np.repeat(np.repeat(np.asarray(out), 2, 1), 2, 2))
        hr_out, _, _ = eng.optimize(
            jnp.asarray(rng.rand(1, hr_size, hr_size, 3).astype(np.float32) * 255 - 120),
            jnp.asarray(rng.rand(1, hr_size, hr_size, 3).astype(np.float32) * 255 - 120),
            init_image=up, max_iters=500)
        _sync(hr_out)
        t0 = time.perf_counter()
        hr_out, _, _ = eng.optimize(
            jnp.asarray(rng.rand(1, hr_size, hr_size, 3).astype(np.float32) * 255 - 120),
            jnp.asarray(rng.rand(1, hr_size, hr_size, 3).astype(np.float32) * 255 - 120),
            init_image=up, max_iters=500)
        _sync(hr_out)
        dt += time.perf_counter() - t0
        return {"metric": f"gatys_{size}to{hr_size}_coarse2fine_seconds",
                "value": round(dt, 3), "unit": "s",
                "vs_baseline": round(5.0 / max(dt, 1e-9), 3)}
    return {"metric": f"gatys_{size}sq_{iters}iter_seconds", "value": round(dt, 3),
            "unit": "s", "vs_baseline": round(5.0 / max(dt, 1e-9), 3)}


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
    state, m = eng.train_step(state, a, b)
    _sync(m)
    state, m = eng.train_step(state, a, b)
    _sync(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = eng.train_step(state, a, b)
    _sync(m)
    dt = (time.perf_counter() - t0) / iters
    return {"metric": f"cyclegan_{size}sq_train_step_images_per_sec",
            "value": round(batch / dt, 1), "unit": "images/sec/chip",
            "vs_baseline": 0.0}


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
    state, m, _ = eng.train_step(state, label, None, image)
    _sync(m)
    compile_s = round(_t.perf_counter() - t_compile, 1)
    state, m, _ = eng.train_step(state, label, None, image)
    _sync(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m, _ = eng.train_step(state, label, None, image)
    _sync(m)
    dt = (time.perf_counter() - t0) / iters
    return {"metric": f"p2phd_{net_g}_{size}sq_train_step_seconds",
            "value": round(dt, 4), "unit": "s/step", "vs_baseline": 0.0,
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
            "vs_baseline": round(ips / max(bf16, 1e-9), 3),
            "bf16_img_s": round(bf16, 1)}


CONFIGS = {
    "gatys256": lambda: bench_gatys(256, 300),
    # the north-star config: 512² full 300-iter optimization, <5 s target
    "gatys512": lambda: bench_gatys(512, 300),
    "gatys_hr": lambda: bench_gatys(512, 300, hr=True),
    "cyclegan256": lambda: bench_cyclegan_train(256, 4),
    "p2phd512": lambda: bench_p2phd_train(512, "global", 2),
    "p2phd1024": lambda: bench_p2phd_train(1024, "local", 3),
    "p2phd512_int8": lambda: bench_p2phd_infer(512, engine="int8"),
    "unet512_int8": lambda: bench_unet_infer(512),
    # the shipped r2l_MSRB_7 recipe at its true resolution (fp32, 512²) —
    # evidence that the heaviest train-step program compiles and steps
    "unet512_train": lambda: bench_p2phd_train(512, "UNet", 2, iters=3,
                                               compute_dtype="float32"),
    "p2phd1024_int8": lambda: bench_local_infer(1024),
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
            "vs_baseline": round(ips / max(bf16, 1e-9), 3),
            "bf16_img_s": round(bf16, 1)}


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
            "vs_baseline": round(ips / max(bf16, 1e-9), 3),
            "bf16_img_s": round(bf16, 1)}


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
