"""Chip probe: is a LAZY stage IN (stats reduce + normalize-as-conv-input)
cheaper than the materialized relu(instance_norm(x)) -> conv composition?

The headline int8 engine spends ~28 ms/run (of 99.5) in convert_reduce
fusions around the stage INs (benchmarks/profile_headline_r5_head2297.json).
The open question this probe answers per stage shape: does XLA TPU fuse the
elementwise ``relu((x - mean) * rsigma)`` producer into the consuming
convolution (one HBM read of x for stats + one for the conv), or does it
materialize the normalized tensor anyway (extra full write+read)?

Variants per (shape, consumer):
  mat    : y = conv(relu(instance_norm(x)))              -- current engine
  lazy   : mean,rs = stats(x); y = conv(relu((x-mean)*rs))
  raw    : y = conv(relu(x))                              -- no-IN floor

Run:  python tools/probe_stage_in.py [--batch 256]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.ops import nn as tnn

    # (name, H, Cin, consumer) — the headline engine's stage-IN sites at
    # 256² / features 64: stem->down0, down0->down1, down1->chain(materialize
    # is forced there), up0->up1(convT), up1->up2(convT).
    cases = [
        ("stem64@256", 256, 64, ("conv", 128)),
        ("down0@128", 128, 128, ("conv", 256)),
        ("up0@64", 64, 256, ("convt", 128)),
        ("up1@128", 128, 128, ("convt", 64)),
    ]

    rng = np.random.RandomState(0)

    def consume(h, kind, w):
        if kind == "conv":
            return tnn.conv2d(h, w, None, stride=2, padding=1)
        return tnn.conv_transpose2d(h, w, None, stride=2, padding=1,
                                    output_padding=1)

    def timeit(fn, x):
        out = fn(x)
        float(jnp.sum(out.astype(jnp.float32)))  # sync (axon: fetch, not block)
        t0 = time.perf_counter()
        o = x
        for _ in range(args.iters):
            o = fn(x)
        float(jnp.sum(o.astype(jnp.float32)))
        return (time.perf_counter() - t0) / args.iters * 1e3

    print(f"batch={args.batch}  (ms per call; lower is better)")
    print(f"{'case':<14} {'mat':>8} {'lazy':>8} {'raw':>8}  verdict")
    for name, hw, cin, (kind, cout) in cases:
        x = jnp.asarray(rng.randn(args.batch, hw, hw, cin)
                        .astype(np.float32)).astype(jnp.bfloat16)
        if kind == "conv":
            w = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32)
                            * 0.05).astype(jnp.bfloat16)
        else:
            # conv_transpose2d takes HWIO with I = input channels
            w = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32)
                            * 0.05).astype(jnp.bfloat16)

        @jax.jit
        def mat(x, w=w, kind=kind):
            return consume(tnn.relu(tnn.instance_norm(x)), kind, w)

        @jax.jit
        def lazy(x, w=w, kind=kind):
            mean, rs = tnn.instance_norm_stats(x)
            xn = jnp.maximum(((x.astype(jnp.float32) - mean) * rs)
                             .astype(x.dtype), 0)
            return consume(xn, kind, w)

        @jax.jit
        def raw(x, w=w, kind=kind):
            return consume(jnp.maximum(x, 0), kind, w)

        tm, tl, tr = timeit(mat, x), timeit(lazy, x), timeit(raw, x)
        verdict = "LAZY WINS" if tl < 0.97 * tm else \
            ("same" if tl < 1.03 * tm else "lazy loses")
        print(f"{name:<14} {tm:8.3f} {tl:8.3f} {tr:8.3f}  {verdict}")


if __name__ == "__main__":
    main()
