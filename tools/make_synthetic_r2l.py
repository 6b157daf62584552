"""Generate a structured synthetic radar→lidar paired dataset.

The reference trains on Oxford Radar RobotCar scans (``p2pHD/checkpoints/
r2l_MSRB_7/opt.txt`` points at the processed radar/lidar PNG pairs). No such
data ships in-container, so quality runs use this generator: top-down scenes
of walls/arcs/blobs rendered twice —

  * **lidar**: crisp thin strokes (what a laser scanner returns),
  * **radar**: the same structure widened + radial falloff + multiplicative
    speckle + noise floor + dropout patches (classic FMCW artifacts).

The radar→lidar mapping is therefore a real, learnable denoise/sharpen task
with per-scene ground truth, so fidelity (correlation/L1 against true lidar)
measures genuine learning rather than memorised noise.

Usage: python tools/make_synthetic_r2l.py --out /tmp/r2l_data --n 128 --size 512
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image, ImageDraw, ImageFilter


def _scene_strokes(rng: np.random.RandomState, size: int):
    """Random walls (chords), arcs, and small blobs for one scene."""
    strokes = []
    for _ in range(rng.randint(4, 9)):  # walls
        p0 = rng.uniform(0.1, 0.9, 2) * size
        ang = rng.uniform(0, 2 * np.pi)
        ln = rng.uniform(0.15, 0.6) * size
        p1 = p0 + ln * np.array([np.cos(ang), np.sin(ang)])
        strokes.append(("line", (*p0, *p1)))
    for _ in range(rng.randint(1, 4)):  # arcs
        c = rng.uniform(0.2, 0.8, 2) * size
        r = rng.uniform(0.08, 0.3) * size
        a0 = rng.uniform(0, 360)
        strokes.append(("arc", (c[0] - r, c[1] - r, c[0] + r, c[1] + r,
                                a0, a0 + rng.uniform(40, 200))))
    for _ in range(rng.randint(2, 6)):  # point-like obstacles
        c = rng.uniform(0.1, 0.9, 2) * size
        r = rng.uniform(1.5, 4.0) * size / 512
        strokes.append(("blob", (c[0] - r, c[1] - r, c[0] + r, c[1] + r)))
    return strokes


def _render(strokes, size: int, width: int) -> np.ndarray:
    img = Image.new("L", (size, size), 0)
    d = ImageDraw.Draw(img)
    for kind, xy in strokes:
        if kind == "line":
            d.line(xy, fill=255, width=width)
        elif kind == "arc":
            d.arc(xy[:4], xy[4], xy[5], fill=255, width=width)
        else:
            d.ellipse(xy, fill=255)
    return np.asarray(img, np.float32) / 255.0


def make_pair(seed: int, size: int = 512):
    """Return (radar, lidar) float arrays in [0,1] for scene ``seed``."""
    rng = np.random.RandomState(seed)
    strokes = _scene_strokes(rng, size)
    w = max(1, size // 512)
    lidar = _render(strokes, size, width=w)

    # radar: widen + blur the same structure, radial falloff, speckle,
    # noise floor, dropout sectors
    radar = _render(strokes, size, width=4 * w)
    radar = np.asarray(
        Image.fromarray((radar * 255).astype(np.uint8)).filter(
            ImageFilter.GaussianBlur(1.5 * w)), np.float32) / 255.0
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    rr = np.hypot(yy - size / 2, xx - size / 2) / (size / 2)
    radar *= np.clip(1.25 - 0.8 * rr, 0.15, 1.0)          # radial falloff
    radar *= rng.gamma(4.0, 0.25, radar.shape).astype(np.float32)  # speckle
    radar += rng.uniform(0.02, 0.06) * rng.rand(*radar.shape)      # floor
    theta = np.arctan2(yy - size / 2, xx - size / 2)
    for _ in range(rng.randint(0, 3)):                     # dropout sectors
        a = rng.uniform(-np.pi, np.pi)
        radar *= np.where(np.abs(np.angle(np.exp(1j * (theta - a))))
                          < rng.uniform(0.05, 0.2), 0.2, 1.0).astype(np.float32)
    return np.clip(radar, 0, 1), lidar


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    for sub in ("radar", "lidar"):
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)
    for i in range(args.n):
        radar, lidar = make_pair(args.seed * 100003 + i, args.size)
        for sub, arr in (("radar", radar), ("lidar", lidar)):
            Image.fromarray((arr * 255).astype(np.uint8)).save(
                os.path.join(args.out, sub, f"{i:05d}.png"))
    print(f"wrote {args.n} pairs ({args.size}²) under {args.out}")


if __name__ == "__main__":
    main()
