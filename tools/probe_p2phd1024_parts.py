"""Decompose the p2phd local-1024² train step into component costs.

The committed per-op profile (benchmarks/profile_train_p2phd1024.json) is a
flat tail — 3900 ops, top op 4% — so this probe answers the altitude
question instead: how do G-forward / G-backward / D-forward(3 scales) /
D-backward split the 200 ms device time, and what would the shift-channel
head conv (the flagship engine's trick) buy in the TRAIN path?

Run:  python tools/probe_p2phd1024_parts.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.models.pix2pixhd import (LocalEnhancer,
                                             MultiscaleDiscriminator)

    size, ngf = 1024, 32
    rng = np.random.RandomState(0)
    g = LocalEnhancer(output_nc=1, ngf=ngf)
    d = MultiscaleDiscriminator(num_D=3, get_interm_feat=True)
    x = jnp.asarray(rng.rand(1, size, size, 1).astype(np.float32) * 2 - 1)
    gp = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))["params"]
    dp = d.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 2)))["params"]
    dx = jnp.asarray(rng.rand(2, size, size, 2).astype(np.float32) * 2 - 1)

    cdt = jnp.bfloat16

    def leaves_sum(t):
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(t))

    def timeit(fn, *args, iters=8):
        out = fn(*args)
        float(leaves_sum(out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(leaves_sum(out))
        return (time.perf_counter() - t0) / iters * 1e3

    @jax.jit
    def g_fwd(p, v):
        return g.apply({"params": p}, v.astype(cdt))

    @jax.jit
    def g_fwdbwd(p, v):
        def loss(pp):
            return jnp.sum(g.apply({"params": pp}, v.astype(cdt))
                           .astype(jnp.float32))
        return jax.grad(loss)(p)

    @jax.jit
    def d_fwd(p, v):
        return d.apply({"params": p}, v.astype(cdt))

    @jax.jit
    def d_fwdbwd(p, v):
        def loss(pp):
            outs = d.apply({"params": pp}, v.astype(cdt))
            return sum(jnp.sum(o[-1].astype(jnp.float32)) for o in outs)
        return jax.grad(loss)(p)

    for name, fn, args in (
            ("G fwd (1024^2)", g_fwd, (gp, x)),
            ("G fwd+bwd", g_fwdbwd, (gp, x)),
            ("D fwd 3-scale (batch2)", d_fwd, (dp, dx)),
            ("D fwd+bwd", d_fwdbwd, (dp, dx))):
        print(f"{name:<26} {timeit(fn, *args):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
