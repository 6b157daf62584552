"""Why does LocalEnhancer-1024² backward cost 6.3× its forward?

``tools/probe_p2phd1024_parts.py`` measured G fwd 30.7 ms vs G fwd+bwd
193 ms on chip. A clean conv backward is ~2-3× forward traffic (dgrad +
wgrad + stored-activation reads), so ~70-100 ms of the backward is
suspected XLA layout copies around the bf16 wgrad convolutions — the same
``bf16[...]{0,3,2,1}`` disease the Gatys-1024² profile isolated
(``benchmarks/profile_gatys1024.json``).

This probe per-op-profiles G fwd+bwd at the suite shape and aggregates the
device time into categories (conv / copy-transpose / reduce / elementwise
fusion), then times structural variants:

  base    — jax.grad over the flax apply (what the train step does)
  remat   — jax.checkpoint'd apply (recompute instead of store: different
            layout constraints, less live memory, more flops)
  f32bwd  — fp32 activations (layout copies vanish if they are bf16-only)

Run (real chip, AFTER other chip jobs finish — timing shares the device):
    python tools/probe_g_backward.py [--size 1024] [--out F]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def categorize(rows):
    cats = {}
    for r in rows:
        op = r["op"]
        if "convolution" in op:
            c = "convolution(+fused)"
        elif op.startswith("copy") or "transpose" in op or op.startswith(
                "reverse") or op.startswith("reshape") or "bitcast" in op:
            c = "layout (copy/transpose/reshape)"
        elif "reduce" in op:
            c = "reduce fusions (IN stats/grads)"
        elif op.startswith("fusion") or "fusion" in op:
            c = "elementwise fusions"
        else:
            c = "other"
        cats[c] = cats.get(c, 0.0) + r["total_ms"]
    return cats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--out", default=None)
    p.add_argument("--variants", default="base,remat")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.models.pix2pixhd import LocalEnhancer
    from cistar_tpu.runtime.profiler import profile_op_table

    size = args.size
    rng = np.random.RandomState(0)
    g = LocalEnhancer(output_nc=1, ngf=32)
    x = jnp.asarray(rng.rand(1, size, size, 1).astype(np.float32) * 2 - 1)
    gp = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))["params"]

    def make(variant):
        cdt = jnp.float32 if variant == "f32bwd" else jnp.bfloat16

        def apply_fn(pp, v):
            return g.apply({"params": pp}, v.astype(cdt))
        if variant == "remat":
            apply_fn = jax.checkpoint(apply_fn)

        @jax.jit
        def fwdbwd(pp, v):
            def loss(q):
                return jnp.sum(apply_fn(q, v).astype(jnp.float32))
            return jax.grad(loss)(pp)
        return fwdbwd

    report = {"size": size, "variants": {}}
    for variant in args.variants.split(","):
        fn = make(variant)
        t0 = time.time()
        rows, totals = profile_op_table(fn, gp, x, iters=args.iters)
        cats = {k: round(v / totals["runs"], 2)
                for k, v in categorize(rows).items()}
        rep = {"per_run_ms": round(totals["per_run_ms"], 2),
               "compile_plus_profile_s": round(time.time() - t0, 1),
               "categories_ms": dict(sorted(cats.items(),
                                            key=lambda kv: -kv[1])),
               "top10": [{"op": r["op"],
                          "ms": round(r["total_ms"] / totals["runs"], 3)}
                         for r in rows[:10]]}
        report["variants"][variant] = rep
        print(variant, json.dumps(rep, indent=1), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
