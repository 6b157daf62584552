"""Per-op profile of the Gatys L-BFGS program (VERDICT r3 #8).

Captures the xplane op table for the 512² (and optionally 1024² HR) L-BFGS
step on the real chip, prints the top ops, and writes a JSON artifact. This
is the evidence base for attacking the coarse-to-fine time: it shows where
the 12 ms/iter at 512² actually goes (VGG convs vs L-BFGS history math).

Run: python tools/profile_gatys.py [--size 512] [--iters 20] [--batch 1]
     [--history 100] [--history_dtype float32|bfloat16]
     [--out benchmarks/profile_gatys.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--iters", type=int, default=20,
                   help="L-BFGS iterations in the traced program (a short "
                        "loop profiles the same per-iter op mix as 300)")
    p.add_argument("--batch", type=int, default=1,
                   help=">1 profiles the vmapped optimize_batch program")
    p.add_argument("--history", type=int, default=100)
    p.add_argument("--history_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--out", default="")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.core.cache import enable_compilation_cache
    from cistar_tpu.core.config import get_ist_cfg_defaults
    from cistar_tpu.engines.ist import GatysEngine
    from cistar_tpu.models import vgg as vgg_lib
    from cistar_tpu.runtime.profiler import format_op_table, profile_op_table

    enable_compilation_cache()
    cfg = get_ist_cfg_defaults()
    cfg.DATA.IMG_SIZE = args.size
    eng = GatysEngine(cfg, vgg_lib.init_vgg_params(seed=0),
                      compute_dtype=jnp.bfloat16,
                      history_size=args.history,
                      history_dtype=getattr(jnp, args.history_dtype))
    rng = np.random.RandomState(0)
    size = args.size

    if args.batch > 1:
        contents = jnp.asarray(rng.rand(args.batch, 1, size, size, 3)
                               .astype(np.float32) * 255 - 120)
        styles = jnp.asarray(rng.rand(args.batch, 1, size, size, 3)
                             .astype(np.float32) * 255 - 120)
        run = lambda: eng.optimize_batch(contents, styles,
                                         max_iters=args.iters)[0]
    else:
        content = jnp.asarray(rng.rand(1, size, size, 3)
                              .astype(np.float32) * 255 - 120)
        style = jnp.asarray(rng.rand(1, size, size, 3)
                            .astype(np.float32) * 255 - 120)
        run = lambda: eng.optimize(content, style, max_iters=args.iters)[0]

    # timing reference (warm): seconds per L-BFGS iteration
    out = run()
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = run()
    float(jnp.sum(out))
    wall = time.perf_counter() - t0
    per_iter_ms = wall / args.iters * 1000.0

    rows, totals = profile_op_table(lambda _: run(), 0, iters=3)
    print(f"\n=== gatys {size}sq batch={args.batch} history={args.history} "
          f"({args.history_dtype}): {per_iter_ms:.2f} ms/iter wall ===")
    print(format_op_table(rows, totals, top=args.top))

    if args.out:
        art = {"size": size, "batch": args.batch, "history": args.history,
               "history_dtype": args.history_dtype,
               "iters": args.iters, "per_iter_ms": round(per_iter_ms, 3),
               "totals": totals, "rows": rows[:args.top]}
        with open(args.out, "w") as f:
            json.dump(art, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
