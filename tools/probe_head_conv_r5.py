"""Round-5 head-conv probe: correctness + chip timing per variant.

Each variant runs in THIS process; drive one variant per subprocess with a
timeout so a Mosaic compile wedge cannot block the session:
    timeout 300 python tools/probe_head_conv_r5.py --variant pallas
Variants: xla (reference path), taps (head_conv_tanh_xla),
          pallas (head_conv_tanh_pallas), pallas_in (fused pre-IN variant).
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", required=True,
                   choices=["xla", "taps", "shift", "pallas", "pallas_in"])
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--cin", type=int, default=64)
    p.add_argument("--rows", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--check", action="store_true",
                   help="golden-check vs ops.nn at a small shape first")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.ops import nn as tnn
    from cistar_tpu.ops.head_conv import (head_conv_tanh_pallas,
                                          head_conv_tanh_shift,
                                          head_conv_tanh_xla)

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(7, 7, args.cin, 1).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(1).astype(np.float32) * 0.1)

    def ref(x):
        return tnn.tanh(tnn.conv2d_reflect(x, w, b))

    def ref_in(x):
        return tnn.tanh(tnn.conv2d_reflect(
            tnn.relu(tnn.instance_norm(x)), w, b))

    fns = {
        "xla": ref,
        "taps": lambda x: head_conv_tanh_xla(x, w, b),
        "shift": lambda x: head_conv_tanh_shift(x, w, b),
        "pallas": lambda x: head_conv_tanh_pallas(x, w, b, rows=args.rows),
        "pallas_in": lambda x: head_conv_tanh_pallas(x, w, b, rows=args.rows,
                                                     pre_in=True),
    }
    fn = jax.jit(fns[args.variant])

    if args.check:
        xs = jnp.asarray(rng.randn(2, 64, 64, args.cin).astype(np.float32))
        xs = xs.astype(jnp.bfloat16)
        got = np.asarray(fn(xs), np.float32)
        want_fn = ref_in if args.variant == "pallas_in" else ref
        want = np.asarray(jax.jit(want_fn)(xs), np.float32)
        err = np.abs(got - want).max()
        print(f"[{args.variant}] small-shape maxabs vs ref: {err:.2e}")
        assert err < 5e-3, err

    # Generate the flagship input ON DEVICE: a (256,256,256,64) host array is
    # 4.3 GB and takes minutes through the axon tunnel.
    x = jax.jit(lambda k: (jax.random.uniform(k, (args.batch, args.size,
                                                  args.size, args.cin))
                           * 2 - 1).astype(jnp.bfloat16))(jax.random.PRNGKey(1))
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    y = fn(x)
    float(jnp.sum(y.astype(jnp.float32)))
    compile_s = time.perf_counter() - t0
    print(f"[{args.variant}] compile+first: {compile_s:.1f}s")
    for _ in range(3):
        y = fn(x)
    float(jnp.sum(y.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        y = fn(x)
    float(jnp.sum(y.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / args.iters
    print(f"[{args.variant}] {dt * 1e3:.2f} ms/call "
          f"({args.batch / dt:.0f} img/s) at "
          f"({args.batch},{args.size},{args.size},{args.cin})")

    # flagship-shape correctness (cheap: compare a slice against ref)
    if args.variant != "xla":
        want_fn = ref_in if args.variant == "pallas_in" else ref
        want = jax.jit(want_fn)(x[:2])
        got = fn(x[:2]) if args.variant.startswith("pallas") else y[:2]
        err = np.abs(np.asarray(got, np.float32)
                     - np.asarray(want, np.float32)).max()
        print(f"[{args.variant}] flagship-shape maxabs vs ref: {err:.2e}")


if __name__ == "__main__":
    main()
