"""bf16-vs-fp32 loss-curve overlay for the shipped train recipes.

VERDICT r4 #2 evidence: switching the shipped recipes (UNet-MSRB 512², the
flagship deployment trainer, and p2pHD local 1024²) from fp32 to bf16
compute must not change training behaviour. This driver runs the SAME
engine config + data stream under both compute policies for N steps,
records every per-step loss, and quantifies the divergence against the
natural yardstick: the drift of an fp32 run whose initial params are
perturbed at bf16-epsilon scale (what bf16 rounding itself injects into a
chaotic GAN trajectory). bf16 passes if its divergence from fp32 is of the
same order as that band.

Reference role: apex AMP O1 training (``p2pHD/train.py:66-68``) — the
reference itself trains mixed-precision without a parity artifact; this
tool IS that artifact for the TPU build.

Run (real chip):
    python tools/bf16_train_overlay.py --config unet512 --steps 40 \
        --out benchmarks/bf16_train_overlay.json
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def run_curve(config: str, dtype_name: str, steps: int, data_seed: int = 0,
              perturb: float = 0.0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.engines.p2phd import Pix2PixHD

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    size, net_g, num_d, ngf = {"unet512": (512, "UNet", 2, 64),
                               "p2phd1024": (1024, "local", 3, 32)}[config]
    kw = {"n_blocks_global": 3} if net_g == "UNet" else {}
    eng = Pix2PixHD(net_g=net_g, ngf=ngf, num_d=num_d, image_size=size,
                    compute_dtype=dtype, **kw)
    state = eng.init_state(jax.random.PRNGKey(0), image_size=size)
    if perturb:
        # bf16-rounding-scale relative perturbation of the initial params:
        # the honest sensitivity yardstick for a chaotic GAN trajectory
        # (a different data/init seed would dwarf any dtype effect)
        key = jax.random.PRNGKey(123)
        leaves, treedef = jax.tree.flatten(state.g)
        keys = jax.random.split(key, len(leaves))
        leaves = [l * (1 + perturb * jax.random.normal(k, l.shape, l.dtype))
                  if hasattr(l, "shape") and l.ndim > 0 else l
                  for l, k in zip(leaves, keys)]
        state = state._replace(g=jax.tree.unflatten(treedef, leaves))

    # deterministic synthetic radar/lidar-like stream: sparse positive
    # blobs on a -1 background (the Radar2LidarDataset normalize range)
    rng = np.random.RandomState(data_seed)

    def batch():
        lab = rng.rand(1, size, size, 1).astype(np.float32)
        img = rng.rand(1, size, size, 1).astype(np.float32)
        lab = np.where(lab > 0.97, lab, 0.0) * 2 - 1
        img = np.where(img > 0.95, img, 0.0) * 2 - 1
        return jnp.asarray(lab), jnp.asarray(img)

    curves: dict = {}
    t0 = time.perf_counter()
    for i in range(steps):
        label, image = batch()
        state, metrics, _ = eng.train_step(state, label, None, image)
        for k, v in metrics.items():
            curves.setdefault(k, []).append(float(v))
        if i == 0:
            print(f"  [{dtype_name}] first step "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
    dt = time.perf_counter() - t0
    return curves, dt / steps


def summarize(fp32, bf16, fp32b):
    """Per-loss mean |bf16-fp32| vs mean |fp32perturbed-fp32| (noise
    band from a bf16-epsilon-scale init perturbation run in fp32)."""
    out = {}
    for k in fp32:
        a = fp32[k]
        b = bf16[k]
        c = fp32b[k]
        n = min(len(a), len(b), len(c))
        dev = sum(abs(x - y) for x, y in zip(a[:n], b[:n])) / n
        noise = sum(abs(x - y) for x, y in zip(a[:n], c[:n])) / n
        out[k] = {"mean_abs_dev_bf16": round(dev, 5),
                  "fp32_run_noise": round(noise, 5),
                  "ratio": round(dev / noise, 3) if noise > 1e-9 else None}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="unet512",
                    choices=["unet512", "p2phd1024"])
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--out", default="benchmarks/bf16_train_overlay.json")
    args = ap.parse_args()

    print(f"{args.config}: fp32 curve ({args.steps} steps)", flush=True)
    fp32, s_fp32 = run_curve(args.config, "fp32", args.steps)
    print(f"{args.config}: bf16 curve", flush=True)
    bf16, s_bf16 = run_curve(args.config, "bf16", args.steps)
    print(f"{args.config}: fp32 noise-band curve (init perturbed at "
          "bf16-epsilon scale)", flush=True)
    fp32b, _ = run_curve(args.config, "fp32", args.steps, perturb=4e-3)

    summary = summarize(fp32, bf16, fp32b)
    artifact = {
        "config": args.config, "steps": args.steps,
        "s_per_step": {"fp32": round(s_fp32, 4), "bf16": round(s_bf16, 4),
                       "speedup": round(s_fp32 / s_bf16, 3)},
        "summary": summary,
        "curves": {"fp32": fp32, "bf16": bf16, "fp32_perturbed": fp32b},
    }
    try:
        with open(args.out) as f:
            existing = json.load(f)
    except Exception:
        existing = {}
    existing[args.config] = artifact
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps({"config": args.config,
                      "s_per_step": artifact["s_per_step"],
                      "summary": summary}, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
