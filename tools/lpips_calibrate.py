"""Calibrate the LPIPS-style metric against the 1e-2 north-star budget.

Two measurements, written to ``benchmarks/lpips_calibration.json``:

1. **Implementation parity** — the jax ``utils/lpips.py`` pipeline vs a
   line-for-line torch mirror of the standard LPIPS computation
   (unit-normalized VGG features, squared diff, spatial mean, layer sum)
   using the *same* converted seeded VGG-16. Agreement to ~1e-5 proves our
   units are the standard LPIPS computation; only the head weights are
   uniform instead of the released linear heads.

2. **Distortion battery** — synthetic radar/lidar-like frames under Gaussian
   noise / blur / shift / contrast distortions of known size. Records the
   uniform-head metric alongside pixel L1 and PSNR, and fits the local slope
   ``metric ≈ slope · L1`` in the small-distortion regime. This converts
   pixel-parity results (golden tests measure max-abs/L1 deviation vs the
   torch reference) into a perceptual-distance bound: an output within
   ``L1 ≤ 1e-2 / slope`` of the reference is within the LPIPS budget for ANY
   bounded per-channel head reweighting of these features.

Run on the TPU (jax side) — torch mirror runs on CPU:
  python tools/lpips_calibrate.py --out benchmarks/lpips_calibration.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_frames(size: int, n: int = 2):
    """Radar-like sparse dots + lidar-like rings, NHWC float32 in [0, 1]."""
    import numpy as np

    rng = np.random.RandomState(0)
    frames = []
    for i in range(n):
        dots = (rng.rand(size, size) > 0.985).astype(np.float32)
        yy, xx = np.mgrid[:size, :size]
        rad = np.sqrt((yy - size / 2) ** 2 + (xx - size / 2) ** 2)
        rings = (np.sin(rad / (3.0 + i)) > 0.7).astype(np.float32)
        img = np.clip(dots + 0.6 * rings, 0, 1)[..., None]
        frames.append(img)
    return np.stack(frames)


def torch_lpips_mirror(sd, a, b, keys):
    """Line-for-line torch mirror of utils/lpips.py (ImageNet scaling)."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    from cistar_tpu.models.vgg import VGG16_FORWARD_SEQ

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def prep(x):  # NHWC [0,1] -> NCHW normalized
        t = torch.from_numpy(np.asarray(x, np.float32)).permute(0, 3, 1, 2)
        if t.shape[1] == 1:
            t = t.expand(-1, 3, -1, -1)
        return (t - mean) / std

    def feats(x):
        acts = {}
        h = x
        for name in VGG16_FORWARD_SEQ:
            if name.startswith("pool"):
                h = F.max_pool2d(h, 2, 2)
            else:
                h = F.conv2d(h, sd[_wkey(name)], sd[_bkey(name)], padding=1)
                h = F.relu(h)
                acts["relu" + name[len("conv"):]] = h
            if all(k in acts for k in keys):
                break
        return [acts[k] for k in keys]

    def _norm(f):
        return f / torch.sqrt(torch.sum(f * f, dim=1, keepdim=True) + 1e-10)

    total = torch.zeros(a.shape[0])
    for fa, fb in zip(feats(prep(a)), feats(prep(b))):
        total = total + torch.mean((_norm(fa) - _norm(fb)) ** 2, dim=(1, 2, 3))
    return total.numpy()


_CONV_IDX = {}


def _build_conv_idx():
    from cistar_tpu.models.vgg import VGG16_FORWARD_SEQ

    idx = 0
    for name in VGG16_FORWARD_SEQ:
        if name.startswith("pool"):
            idx += 1
        else:
            _CONV_IDX[name] = idx
            idx += 2


def _wkey(name):
    return f"features.{_CONV_IDX[name]}.weight"


def _bkey(name):
    return f"features.{_CONV_IDX[name]}.bias"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="benchmarks/lpips_calibration.json")
    p.add_argument("--size", type=int, default=128)
    args = p.parse_args(argv)

    import numpy as np

    import jax.numpy as jnp

    from cistar_tpu.models.vgg import (VGG16_CONVS,
                                       torchvision_vgg_features_to_params)
    from cistar_tpu.utils.lpips import _LPIPS_KEYS, lpips_distance
    from tools.make_vgg_weights import make_state_dict

    _build_conv_idx()
    sd = make_state_dict("vgg16-features", seed=7)
    params = torchvision_vgg_features_to_params(
        {k: v.numpy() for k, v in sd.items()}, VGG16_CONVS)

    base = synthetic_frames(args.size)
    rng = np.random.RandomState(1)

    # 1. implementation parity: jax vs torch mirror on noisy pairs
    noisy = np.clip(base + rng.normal(0, 0.05, base.shape), 0, 1).astype(np.float32)
    ours = np.asarray(lpips_distance(jnp.asarray(base), jnp.asarray(noisy),
                                     vgg16_params=params))
    theirs = torch_lpips_mirror(sd, base, noisy, _LPIPS_KEYS)
    parity_max_abs = float(np.max(np.abs(ours - theirs)))
    print(f"jax-vs-torch implementation parity: max |Δ| = {parity_max_abs:.2e} "
          f"(values ~{float(np.mean(theirs)):.4f})")

    # 2. distortion battery
    rows = []

    def record(kind, level, distorted):
        d = np.asarray(lpips_distance(jnp.asarray(base), jnp.asarray(distorted),
                                      vgg16_params=params))
        l1 = float(np.mean(np.abs(base - distorted)))
        mse = float(np.mean((base - distorted) ** 2))
        psnr = float(10 * np.log10(1.0 / mse)) if mse > 0 else float("inf")
        rows.append({"distortion": kind, "level": level,
                     "metric_uniform_head": float(np.mean(d)),
                     "pixel_l1": l1, "psnr_db": round(psnr, 2)})

    for sigma in (1e-4, 3e-4, 1e-3, 3e-3, 1e-2, 3e-2, 1e-1):
        noise = rng.normal(0, sigma, base.shape)
        record("gauss_noise", sigma,
               np.clip(base + noise, 0, 1).astype(np.float32))
    k = np.ones((3, 3), np.float32) / 9.0
    blurred = np.stack([
        np.stack([_conv2(base[i, :, :, 0], k)], axis=-1) for i in range(len(base))
    ]).astype(np.float32)
    for alpha in (0.1, 0.5, 1.0):
        record("box_blur3_mix", alpha,
               ((1 - alpha) * base + alpha * blurred).astype(np.float32))
    shifted = np.roll(base, 1, axis=2)
    record("shift_1px", 1.0, shifted)
    for c in (0.99, 0.95):
        record("contrast", c, (base * c).astype(np.float32))

    # The metric is QUADRATIC in pixel deviation (squared differences of
    # locally-linear feature perturbations): metric ≈ c·L1². Fit c as the
    # max over the whole battery — structured distortions (shift) give the
    # largest c, so this is the conservative constant.
    curv = [(r["metric_uniform_head"] / r["pixel_l1"] ** 2, r)
            for r in rows if r["pixel_l1"] > 0]
    c = float(np.max([v for v, _ in curv]))
    budget_l1 = float((1e-2 / c) ** 0.5)

    for r in rows:
        print(f"  {r['distortion']:<14} level={r['level']:<8g} "
              f"metric={r['metric_uniform_head']:.3e}  L1={r['pixel_l1']:.3e}  "
              f"PSNR={r['psnr_db']}dB")
    print(f"max curvature c = metric/L1² over battery: {c:.3g}")
    print(f"=> pixel L1 ≤ {budget_l1:.2e} keeps the metric under the 1e-2 "
          "north-star budget (metric ≈ c·L1²)")

    artifact = {
        "backbone": "vgg16 seeded he-init (seed 7), converted from torch "
                    "state dict via torchvision_vgg_features_to_params",
        "implementation_parity_max_abs": parity_max_abs,
        "rows": rows,
        "max_curvature_metric_per_l1_sq": c,
        "l1_budget_for_1e-2_metric": budget_l1,
        "note": "uniform-head LPIPS computation; metric ≈ c·L1² converts "
                "golden-test pixel L1 deviations into a perceptual bound "
                "(shift distortions set the conservative c)",
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out}")


def _conv2(img, k):
    import numpy as np

    ph, pw = k.shape[0] // 2, k.shape[1] // 2
    padded = np.pad(img, ((ph, ph), (pw, pw)), mode="edge")
    out = np.zeros_like(img)
    for i in range(k.shape[0]):
        for j in range(k.shape[1]):
            out += k[i, j] * padded[i:i + img.shape[0], j:j + img.shape[1]]
    return out


if __name__ == "__main__":
    main()
