"""On-chip probe: cout=1 7x7 reflect head-conv variants at the flagship shape.

Measures K in-program repetitions (lax.scan over K weight variants, so each
rep re-reads x and nothing folds/CSEs) + one host RTT — the dispatch-gap-free
methodology from bench.py. Run one variant per process under `timeout`, so a
Mosaic compile wedge can't take down the rest:

    timeout 900 python tools/probe_head_conv.py --variant masked
"""
import argparse, sys, time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=["xla", "masked", "maskedloop", "tapxla"],
                    required=True)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--cin", type=int, default=64)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--rows", type=int, default=32)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    from cistar_tpu.ops import nn as tnn
    from cistar_tpu.ops.pallas_kernels import (conv2d_reflect_cout1_masked,
                                               conv2d_reflect_cout1_loop)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.batch, args.size, args.size, args.cin)
                    .astype(np.float32) * 2 - 1).astype(jnp.bfloat16)
    Ws = jnp.asarray(rng.randn(args.reps, 7, 7, args.cin, 1)
                     .astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(1).astype(np.float32) * 0.1)

    def head_xla(xx, wk):
        return jnp.tanh(tnn.conv2d_reflect(xx, wk.astype(xx.dtype), b))

    def head_masked(xx, wk):
        return conv2d_reflect_cout1_masked(xx, wk, b, act="tanh",
                                           rows=args.rows)

    def head_tapxla(xx, wk):
        n, h, wd, cin = xx.shape
        xp = jnp.pad(xx, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        t3 = lax.conv_general_dilated(
            xp, wk.reshape(49, cin, 1, 1).transpose(2, 3, 1, 0)
            .astype(xx.dtype),
            (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        out = jnp.zeros((n, h, wd), jnp.float32)
        for tap in range(49):
            dy, dx = tap // 7, tap % 7
            out = out + t3[:, dy:dy + h, dx:dx + wd, tap]
        return jnp.tanh(out + b[0])[..., None]

    def head_maskedloop(xx, wk):
        return conv2d_reflect_cout1_loop(xx, wk, b, act="tanh",
                                         rows=args.rows)

    head = {"xla": head_xla, "masked": head_masked,
            "maskedloop": head_maskedloop,
            "tapxla": head_tapxla}[args.variant]

    @jax.jit
    def prog(xx, Ws):
        def body(c, wk):
            y = head(xx, wk)
            return c + jnp.sum(y.astype(jnp.float32)), None
        c, _ = lax.scan(body, jnp.zeros((), jnp.float32), Ws)
        return c

    print("compiling main program...", flush=True)
    t0 = time.perf_counter()
    c = float(prog(x, Ws))
    t_compile = time.perf_counter() - t0
    print(f"compiled+first-run in {t_compile:.1f}s", flush=True)
    err = float("nan")
    if args.check:
        yk = head(x[:8], Ws[0]); yr = head_xla(x[:8], Ws[0])
        err = float(jnp.max(jnp.abs(yk.astype(jnp.float32) -
                                    yr.astype(jnp.float32))))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        c = float(prog(x, Ws))
        times.append(time.perf_counter() - t0)
    best = min(times)
    per_call_ms = best / args.reps * 1000.0
    print(f"variant={args.variant} compile_s={t_compile:.1f} "
          f"total_s={best:.4f} per_call_ms={per_call_ms:.2f} "
          f"maxabs_vs_xla={err:.2e} checksum={c:.3f}")


if __name__ == "__main__":
    main()
