"""Per-tier perceptual-fidelity table (VERDICT r4 #8).

For each workload at its shipped resolution, compare every accelerated
tier's output against the fp32 reference-parity output with the calibrated
LPIPS-style metric (``utils/lpips.py``; uniform-head units tied to the 1e-2
north-star budget by ``benchmarks/lpips_calibration.json`` — metric ≈ c·L1²
locally, so small values are directly comparable to the budget) plus raw
pixel L1. Tiers:

  bf16      — the XLA bf16 inference path (what the bench floors measure)
  int8      — the Pallas int8 engines (the TRT-int8 role)
  knobs     — Gatys L-BFGS accelerator knobs (m=20 / bf16 history)
  spatial   — the spatially-sharded generator forward (run on the 8-device
              virtual CPU mesh: ``--rows spatial256`` under
              JAX_PLATFORMS=cpu; mesh-1 on the real chip is trivially exact)

North-star budget: every tier within 1e-2 of fp32 (BASELINE.md). The
fp32 reference itself is parity-tested against the reference's own torch
code in ``tests/test_reference_parity.py``.

Run (real chip):    python tools/fidelity_table.py
Spatial row (CPU):  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
                        python tools/fidelity_table.py --rows spatial256
Results merge into ``benchmarks/fidelity_r5.json``.
"""
from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

BUDGET = 1e-2


def make_radar(batch, size, seed=0):
    """Sparse-dot radar-like frames in [-1, 1], (N,H,W,1) fp32."""
    import numpy as np

    rng = np.random.RandomState(seed)
    x = rng.rand(batch, size, size, 1).astype(np.float32)
    return np.where(x > 0.97, x, 0.0) * 2 - 1


def _metric(ref, out):
    """Calibrated-LPIPS + pixel L1 of `out` vs fp32 `ref` (tanh-range)."""
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.utils.lpips import lpips_distance

    ref01 = (jnp.asarray(ref, jnp.float32) + 1) / 2
    out01 = (jnp.asarray(out, jnp.float32) + 1) / 2
    d = lpips_distance(out01, ref01)
    l1 = jnp.mean(jnp.abs(out01 - ref01))
    return {"lpips_metric": round(float(jnp.mean(d)), 8),
            "pixel_l1": round(float(l1), 8)}


def row_cyclegan256():
    import jax
    import jax.numpy as jnp

    from cistar_tpu.models import fast_infer as fi
    from cistar_tpu.models.cyclegan import ResnetGenerator
    from cistar_tpu.ops.quant_pallas import quantize_resnet_trunk

    model = ResnetGenerator(output_nc=1, n_residual_blocks=9, in_features=64)
    x = jnp.asarray(make_radar(8, 256))
    params = model.init(jax.random.PRNGKey(0), x[:1])["params"]
    q = quantize_resnet_trunk(params, 9)
    ref = jax.jit(lambda p, v: model.apply({"params": p}, v))(params, x)
    bf16 = jax.jit(lambda p, v: model.apply(
        {"params": p}, v.astype(jnp.bfloat16)))(params, x)
    int8 = jax.jit(lambda p, qb, v: fi.resnet_generator_int8_trunk_apply(
        p, qb, v.astype(jnp.bfloat16), 9))(params, q, x)
    return {"bf16": _metric(ref, bf16), "int8": _metric(ref, int8)}


def row_p2phd_global512():
    import jax
    import jax.numpy as jnp

    from cistar_tpu.models.fast_infer import global_generator_int8_trunk_apply
    from cistar_tpu.models.pix2pixhd import GlobalGenerator
    from cistar_tpu.ops.quant_pallas import quantize_global_trunk

    model = GlobalGenerator(output_nc=1, ngf=64, n_downsampling=4, n_blocks=9)
    x = jnp.asarray(make_radar(4, 512))
    params = model.init(jax.random.PRNGKey(0), x[:1])["params"]
    q = quantize_global_trunk(params, 9)
    ref = jax.jit(lambda p, v: model.apply({"params": p}, v))(params, x)
    bf16 = jax.jit(lambda p, v: model.apply(
        {"params": p}, v.astype(jnp.bfloat16)))(params, x)
    int8 = jax.jit(lambda p, qb, v: global_generator_int8_trunk_apply(
        p, qb, v.astype(jnp.bfloat16), n_downsampling=4))(params, q, x)
    return {"bf16": _metric(ref, bf16), "int8": _metric(ref, int8)}


def row_unet512():
    import jax
    import jax.numpy as jnp

    from cistar_tpu.models.fast_infer import (quantize_unet_msrb,
                                              unet_msrb_int8_apply)
    from cistar_tpu.models.pix2pixhd import UNetGeneratorHD

    model = UNetGeneratorHD(output_nc=1, n_residual_blocks=3, in_features=64)
    x = jnp.asarray(make_radar(4, 512))
    params = model.init(jax.random.PRNGKey(0), x[:1])["params"]
    q = quantize_unet_msrb(params, 3)
    ref = jax.jit(lambda p, v: model.apply({"params": p}, v))(params, x)
    bf16 = jax.jit(lambda p, v: model.apply(
        {"params": p}, v.astype(jnp.bfloat16)))(params, x)
    int8 = jax.jit(lambda p, qb, v: unet_msrb_int8_apply(
        p, qb, v.astype(jnp.bfloat16), 3))(params, q, x)
    return {"bf16": _metric(ref, bf16), "int8": _metric(ref, int8)}


def row_local1024():
    import jax
    import jax.numpy as jnp

    from cistar_tpu.models.fast_infer import (local_enhancer_int8_apply,
                                              quantize_local_enhancer)
    from cistar_tpu.models.pix2pixhd import LocalEnhancer

    model = LocalEnhancer(output_nc=1, ngf=32)
    x = jnp.asarray(make_radar(2, 1024))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 1)))["params"]
    q = quantize_local_enhancer(params)
    ref = jax.jit(lambda p, v: model.apply({"params": p}, v))(params, x)
    bf16 = jax.jit(lambda p, v: model.apply(
        {"params": p}, v.astype(jnp.bfloat16)))(params, x)
    int8 = jax.jit(lambda p, qb, v: local_enhancer_int8_apply(
        p, qb, v.astype(jnp.bfloat16)))(params, q, x)
    return {"bf16": _metric(ref, bf16), "int8": _metric(ref, int8)}


def row_gatys512():
    """fp32 full-precision L-BFGS as reference; shipped bf16 default and
    the two accelerator knobs as tiers. (The fp32 trajectory itself is
    torch-parity-tested in tests/test_lbfgs.py.)"""
    import jax.numpy as jnp

    from cistar_tpu.core.config import get_ist_cfg_defaults
    from cistar_tpu.engines.ist import GatysEngine
    from cistar_tpu.models import vgg as vgg_lib

    cfg = get_ist_cfg_defaults()
    cfg.DATA.IMG_SIZE = 512
    vp = vgg_lib.init_vgg_params(seed=0)
    content = jnp.asarray(make_radar(1, 512, seed=1)) * 120
    style = jnp.asarray(make_radar(1, 512, seed=2)) * 120
    content = jnp.broadcast_to(content, (1, 512, 512, 3))
    style = jnp.broadcast_to(style, (1, 512, 512, 3))

    def run(**kw):
        eng = GatysEngine(cfg, vp, **kw)
        out, _, _ = eng.optimize(content, style, max_iters=300)
        # Gatys images live in mean-subtracted BGR*255 space; normalize to
        # tanh-range for the shared metric helper
        return jnp.clip(out / 128.0, -1, 1)

    ref = run(compute_dtype=jnp.float32)
    tiers = {
        "bf16": run(compute_dtype=jnp.bfloat16),
        "bf16_m20": run(compute_dtype=jnp.bfloat16, history_size=20),
        "bf16_hist_bf16": run(compute_dtype=jnp.bfloat16,
                              history_dtype=jnp.bfloat16),
    }
    return {k: _metric(ref, v) for k, v in tiers.items()}


def row_spatial256():
    """Spatially sharded generator forward vs single-device, on the
    8-device virtual CPU mesh (fp32). Run under JAX_PLATFORMS=cpu."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from cistar_tpu.models.pix2pixhd import GlobalGenerator
    from cistar_tpu.parallel.spatial_models import (
        global_generator_sharded_apply)

    model = GlobalGenerator(output_nc=1, ngf=32, n_downsampling=2,
                            n_blocks=3)
    x = jnp.asarray(make_radar(1, 256))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ref = model.apply({"params": params}, x)
    mesh = Mesh(np.asarray(jax.devices()), ("spatial",))
    out = global_generator_sharded_apply(params, x, mesh, n_downsampling=2,
                                         n_blocks=3)
    return {"spatial_8dev": _metric(ref, out)}


ROWS = {
    "cyclegan256": row_cyclegan256,
    "p2phd_global512": row_p2phd_global512,
    "unet_msrb512": row_unet512,
    "local1024": row_local1024,
    "gatys512": row_gatys512,
    "spatial256": row_spatial256,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default="cyclegan256,p2phd_global512,"
                    "unet_msrb512,local1024,gatys512")
    ap.add_argument("--out", default="benchmarks/fidelity_r5.json")
    ap.add_argument("--platform", default="", help="force a jax platform "
                    "(the axon sitecustomize overrides JAX_PLATFORMS, so "
                    "the spatial256 row needs --platform cpu)")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    try:
        with open(args.out) as f:
            table = json.load(f)
    except Exception:
        table = {"budget": BUDGET, "rows": {}}

    for name in args.rows.split(","):
        print(f"--- {name}", flush=True)
        try:
            tiers = ROWS[name]()
            for t in tiers.values():
                t["within_budget"] = bool(t["lpips_metric"] < BUDGET)
            table["rows"][name] = tiers
            print(json.dumps({name: tiers}), flush=True)
        except Exception as e:
            table["rows"][name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"FAILED: {e}", flush=True)

    table["all_within_budget"] = all(
        t.get("within_budget", False)
        for row in table["rows"].values() if "error" not in row
        for t in row.values())
    with open(args.out, "w") as f:
        json.dump(table, f, indent=1)
    print(f"wrote {args.out}  all_within_budget={table['all_within_budget']}")


if __name__ == "__main__":
    main()
