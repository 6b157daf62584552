"""Per-op chip profile of the thin CycleGAN family int8 engines
(bilinear_content / atrous_content-dense at the suite shapes).

Round-5 driver for VERDICT r4 #4: after fusing the encoder stages
(``quant_pallas.multi_atrous_stage_int8``) this names whatever remains —
stem, decoder upsample-convs, head. Run:
    python tools/profile_family.py --family bilinear [--batch 32 --size 512]
"""
from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", choices=["bilinear", "atrousdense"],
                   default="bilinear")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--engine", choices=["int8", "bf16"], default="int8")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.models import fast_infer as fi
    from cistar_tpu.models.cyclegan import build_generator
    from cistar_tpu.runtime.profiler import format_op_table, profile_op_table

    gen_type = {"bilinear": "bilinear_content",
                "atrousdense": "atrous_content"}[args.family]
    model = build_generator(gen_type, output_nc=1, in_features=16,
                            n_residual_blocks=6, dense_decoder=True)
    rng = np.random.RandomState(0)
    x0 = jnp.zeros((1, args.size, args.size, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0)["params"]
    bx = jnp.asarray(rng.rand(args.batch, args.size, args.size, 1)
                     .astype(np.float32) * 2 - 1)

    if args.engine == "bf16":
        fn = jax.jit(lambda v: model.apply(
            {"params": params}, v.astype(jnp.bfloat16)).astype(jnp.float32))
    elif args.family == "bilinear":
        q = fi.quantize_bilinear_trunk(params, 6)
        fn = jax.jit(lambda v: fi.bilinear_generator_int8_trunk_apply(
            params, q, v.astype(jnp.bfloat16), 6,
            expect_kernel=True).astype(jnp.float32))
    else:
        q = fi.quantize_multiscale_trunk(params, 6)
        fn = jax.jit(lambda v: fi.multiscale_generator_int8_trunk_apply(
            params, q, v.astype(jnp.bfloat16), 6, dense_decoder=True,
            expect_kernel=True).astype(jnp.float32))

    rows, totals = profile_op_table(lambda: fn(bx), iters=args.iters)
    print(format_op_table(rows, totals, top=30))
    ips = args.batch * totals["runs"] * 1e3 / totals["total_ms"]
    print(f"device-time throughput: {ips:.1f} img/s")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows[:60], "totals": totals,
                       "config": vars(args)}, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
