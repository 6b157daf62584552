"""Chip-run regression matrix for every int8 Pallas kernel family.

VERDICT r4 #6: the int8 kernels were golden-tested in interpret mode on CPU,
but a Mosaic regression on the real TPU would surface only as the silent 10×
emulation fallback (``models/fast_infer.py`` warning). This driver runs each
kernel family ON THE REAL CHIP with ``expect_kernel=True`` (silent fallback
raises), golden-checks the output against the family's XLA emulation of the
same integer math, times it, and writes one pass/fail + img/s row per family
to ``benchmarks/kernel_matrix_r5.json``.

Reference role: TensorRT engine validation before timing
(``p2pHD/run_engine.py:104-133`` builds + checks the engine, then profiles).

Run:  python tools/kernel_matrix.py [--out benchmarks/kernel_matrix_r5.json]
Each family is wrapped in try/except so one Mosaic regression doesn't mask
the others; a wedged compile is bounded by running under ``timeout``.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def _timed(fn, x, iters=10):
    """Chained-call timing (axon: only a host fetch synchronizes)."""
    import jax.numpy as jnp

    y = fn(x)
    float(jnp.sum(y.astype(jnp.float32)))
    for _ in range(2):
        y = fn(x)
    float(jnp.sum(y.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(x)
    float(jnp.sum(y.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def build_families(args):
    """Each row: (name, make() -> (kernel_fn, emul_fn, ref_fn, x, n_images,
    budget)).

    kernel_fn runs with expect_kernel=True where the chain supports it;
    emul_fn is the XLA emulation of the same integer math (recorded as a
    diagnostic — chained-IN families diverge DENSELY from it on chip
    because an int8 LSB flip shifts the next block's IN statistics);
    ref_fn is the fp32 float reference, and ``|kernel - ref| < budget``
    (the unit goldens' quantization-tolerance standard) is the pass gate.
    """
    import jax
    import jax.numpy as jnp

    from cistar_tpu.models.cyclegan import ResnetGenerator
    from cistar_tpu.models import fast_infer as fi
    from cistar_tpu.ops import nn as tnn
    from cistar_tpu.ops import quant_pallas as qp
    from cistar_tpu.ops.head_conv import head_conv_tanh_shift

    key = jax.random.PRNGKey(0)
    b, s = args.batch, args.size

    def rand(shape, k=1):
        return (jax.random.uniform(jax.random.PRNGKey(k), shape) * 2 - 1) \
            .astype(jnp.bfloat16)

    def resblock_params(cin, cout, k=3, seed=0):
        kk = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(kk)
        mk = lambda kx, ci, co: {"w": (jax.random.normal(kx, (k, k, ci, co))
                                       * 0.1).astype(jnp.float32)}
        return {"conv1": mk(k1, cin, cout), "conv2": mk(k2, cout, cout)}

    def ref_resblock_chain(x, blocks):
        """fp32 plain res-block chain (reflect conv / IN / ReLU / skip)."""
        h = x.astype(jnp.float32)
        for blk in blocks:
            r = tnn.relu(tnn.instance_norm(
                tnn.conv2d_reflect(h, blk["conv1"]["w"])))
            h = tnn.instance_norm(tnn.conv2d_reflect(r, blk["conv2"]["w"])) + h
        return h

    fams = {}

    def fam(name):
        def deco(f):
            fams[name] = f
            return f
        return deco

    @fam("trunk_bf16io")
    def _trunk_bf16io():
        blocks = [resblock_params(64, 64, seed=i) for i in range(3)]
        q = [qp.quantize_resblock(blk) for blk in blocks]
        x = rand((b, s // 4, s // 4, 64))
        kfn = jax.jit(lambda v: qp.resblock_chain_int8_bf16io(
            v, q, expect_kernel=True))
        gfn = jax.jit(lambda v: qp.resblock_chain_int8_bf16io(
            v, q, force_emulate=True))
        ref = jax.jit(lambda v: ref_resblock_chain(v, blocks))
        return kfn, gfn, ref, x, b, 0.35

    @fam("trunk_int8_carrier")
    def _trunk_int8():
        blocks = [resblock_params(64, 64, seed=i) for i in range(3)]
        q = [qp.quantize_resblock(blk) for blk in blocks]
        x = rand((b, s // 4, s // 4, 64))

        def run(v, emulate):
            return qp.resblock_chain_int8(v, q, expect_kernel=not emulate,
                                          force_emulate=emulate)
        ref = jax.jit(lambda v: ref_resblock_chain(v, blocks))
        return (jax.jit(lambda v: run(v, False)),
                jax.jit(lambda v: run(v, True)), ref, x, b, 0.35)

    @fam("trunk_tiled")
    def _trunk_tiled():
        # cout_tile must satisfy the Pallas (8,128) block-divisibility rule:
        # 256 channels tiled by 128 (the shape class the 512-ch engines use)
        blocks = [resblock_params(256, 256, seed=i) for i in range(2)]
        q = [qp.quantize_resblock(blk) for blk in blocks]
        x = rand((b // 2, s // 8, s // 8, 256))

        def run(v, emulate):
            return qp.resblock_chain_int8_tiled(
                v, q, cout_tile=128, expect_kernel=not emulate,
                force_emulate=emulate)
        ref = jax.jit(lambda v: ref_resblock_chain(v, blocks))
        return (jax.jit(lambda v: run(v, False)),
                jax.jit(lambda v: run(v, True)), ref, x, b // 2, 0.35)

    @fam("atrous")
    def _atrous():
        blk = {"atrous": {f"b{i}_conv":
                          {"w": (jax.random.normal(jax.random.PRNGKey(10 + i),
                                                   (3, 3, 32, 32))
                                 * 0.1).astype(jnp.float32)}
                          for i in range(4)},
               "conv": {"w": (jax.random.normal(jax.random.PRNGKey(20),
                                                (3, 3, 32, 32))
                              * 0.1).astype(jnp.float32)}}
        q = [qp.quantize_atrous_resblock(blk)]
        x = rand((b // 2, s // 2, s // 2, 32))

        def run(v, emulate):
            return qp.atrous_resblock_chain_int8(
                v, q, expect_kernel=not emulate, force_emulate=emulate)

        def ref(v):
            h = v.astype(jnp.float32)
            ssum = 0.0
            for i, r in enumerate((2, 4, 6, 8)):
                f = tnn.conv2d(h, blk["atrous"][f"b{i}_conv"]["w"], None,
                               padding=r, dilation=r)
                ssum = ssum + tnn.relu(tnn.instance_norm(f))
            f2 = tnn.conv2d_reflect(ssum, blk["conv"]["w"])
            return tnn.instance_norm(f2) + h
        return (jax.jit(lambda v: run(v, False)),
                jax.jit(lambda v: run(v, True)), jax.jit(ref), x, b // 2,
                0.25)

    @fam("atrous_stage")
    def _atrous_stage():
        # round-5 fused encoder stage (MultiAtrousConv stride 2)
        from cistar_tpu.ops.blocks import MultiAtrousConv

        mod = MultiAtrousConv(32, stride=2)
        x = rand((b // 2, s // 2, s // 2, 16), k=13)
        params = mod.init(jax.random.PRNGKey(4),
                          jnp.zeros(x.shape, jnp.float32))["params"]
        q = qp.quantize_multi_atrous_stage(params)
        kfn = jax.jit(lambda v: qp.multi_atrous_stage_int8(
            v, q, expect_kernel=True))
        gfn = jax.jit(lambda v: qp.multi_atrous_stage_int8(
            v, q, force_emulate=True))
        ref = jax.jit(lambda v: mod.apply(
            {"params": params}, v.astype(jnp.float32)))
        return kfn, gfn, ref, x, b // 2, 0.35

    @fam("msrb")
    def _msrb():
        from cistar_tpu.models.pix2pixhd import UNetGeneratorHD

        model = UNetGeneratorHD(output_nc=1, n_residual_blocks=1,
                                in_features=32)
        params = model.init(jax.random.PRNGKey(3),
                            jnp.zeros((1, s, s, 1), jnp.float32))["params"]
        q = qp.quantize_msrb(params["msrb_0"])
        nf = int(q["w3a"].shape[-1])  # bottleneck width from the tree
        x = rand((b // 4, s // 8, s // 8, nf), k=3)

        def run(v, emulate):
            return qp.msrb_block_int8(v, q, cout_tile=128,
                                      expect_kernel=not emulate,
                                      force_emulate=emulate)

        from cistar_tpu.ops.blocks import MSRB
        ref_mod = MSRB(nf)
        ref = jax.jit(lambda v: ref_mod.apply(
            {"params": params["msrb_0"]}, v.astype(jnp.float32)))
        return (jax.jit(lambda v: run(v, False)),
                jax.jit(lambda v: run(v, True)), ref, x, b // 4, 0.35)

    @fam("bn_folded")
    def _bn_folded():
        # quantize_resblock_bn wants conv1/conv2 + norm1/norm2 (gamma stored
        # as gamma-1) and a matching batch_stats subtree with norm1/norm2
        blk = resblock_params(64, 64, seed=7)
        pblk = {"conv1": blk["conv1"], "conv2": blk["conv2"],
                "norm1": {"gamma": jnp.zeros((64,)) + 0.2,
                          "beta": jnp.zeros((64,)) - 0.05},
                "norm2": {"gamma": jnp.zeros((64,)) - 0.1,
                          "beta": jnp.zeros((64,)) + 0.02}}
        stats = {n: {"mean": jnp.zeros((64,)) + 0.1,
                     "var": jnp.ones((64,)) * 0.8}
                 for n in ("norm1", "norm2")}
        q = [qp.quantize_resblock_bn(pblk, stats)]
        x = rand((b, s // 4, s // 4, 64), k=5)

        def run(v, emulate):
            return qp.resblock_chain_int8_bf16io(
                v, q, bn=True, expect_kernel=not emulate,
                force_emulate=emulate)

        def ref(v):
            def aff(f, nm):
                g = (pblk[nm]["gamma"] + 1.0) \
                    * jax.lax.rsqrt(stats[nm]["var"] + 1e-5)
                return (f - stats[nm]["mean"]) * g + pblk[nm]["beta"]
            h = v.astype(jnp.float32)
            r = tnn.relu(aff(tnn.conv2d_reflect(h, pblk["conv1"]["w"]),
                             "norm1"))
            return aff(tnn.conv2d_reflect(r, pblk["conv2"]["w"]), "norm2") + h
        # budget matches the trunk chains (0.35), not the plain-IN rows'
        # 0.25: folding gamma*rsqrt(var) into the weights widens the
        # per-channel weight ranges, so the per-tensor int8 grid is coarser.
        # Measured on chip 2026-08-19: maxabs_vs_fp32 0.2695 with the kernel
        # BIT-EXACT vs emulation (0.0) — i.e. pure quantization error, not a
        # Mosaic regression (which is what this row guards against).
        return (jax.jit(lambda v: run(v, False)),
                jax.jit(lambda v: run(v, True)), jax.jit(ref), x, b, 0.35)

    @fam("head_shift")
    def _head_shift():
        w = (jax.random.normal(jax.random.PRNGKey(8), (7, 7, 64, 1))
             * 0.05).astype(jnp.float32)
        bias = jnp.zeros((1,), jnp.float32)
        x = rand((b, s, s, 64), k=8)
        kfn = jax.jit(lambda v: head_conv_tanh_shift(v, w, bias))
        gfn = jax.jit(lambda v: tnn.tanh(tnn.conv2d_reflect(v, w, bias)))
        ref = jax.jit(lambda v: tnn.tanh(tnn.conv2d_reflect(
            v.astype(jnp.float32), w, bias)))
        return kfn, gfn, ref, x, b, 0.02

    @fam("resnet_engine_e2e")
    def _resnet_engine():
        model = ResnetGenerator(output_nc=1, n_residual_blocks=3,
                                in_features=32)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, s, s, 1), jnp.float32))["params"]
        q = qp.quantize_resnet_trunk(params, 3)
        x = rand((b, s, s, 1), k=9)
        kfn = jax.jit(lambda v: fi.resnet_generator_int8_trunk_apply(
            params, q, v, 3, expect_kernel=True))
        gfn = jax.jit(lambda v: fi.resnet_generator_int8_trunk_apply(
            params, q, v, 3, expect_kernel=False, force_emulate=True))
        ref = jax.jit(lambda v: model.apply(
            {"params": params}, v.astype(jnp.float32)))
        return kfn, gfn, ref, x, b, 0.1

    return fams


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="benchmarks/kernel_matrix_r5.json")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--only", default=None, help="comma-separated family names")
    args = p.parse_args()

    import jax
    import numpy as np

    dev = jax.devices()[0]
    fams = build_families(args)
    only = set(args.only.split(",")) if args.only else None
    rows = []
    for name, make in fams.items():
        if only and name not in only:
            continue
        row = {"family": name}
        t0 = time.perf_counter()
        try:
            kfn, gfn, ref_fn, x, n_img, budget = make()
            got = np.asarray(kfn(x), np.float32)
            want = np.asarray(gfn(x), np.float32)
            ref = np.asarray(ref_fn(x), np.float32)
            # vs-emulation deltas are DIAGNOSTIC: affine families (bn/msrb/
            # head) match bit-for-bit on chip, but IN-bearing chains diverge
            # densely — an int8 LSB flip at a quantize boundary shifts the
            # next block's IN statistics, so kernel-vs-emulation drift grows
            # with chain depth while BOTH stay inside quantization noise of
            # the fp32 reference. The PASS gate is therefore the same
            # standard the unit goldens enforce: |kernel - fp32| < budget.
            err = np.abs(got - want)
            row["maxabs_vs_emulation"] = float(err.max())
            row["meanabs_vs_emulation"] = float(err.mean())
            err_ref = np.abs(got - ref)
            row["maxabs_vs_fp32"] = float(err_ref.max())
            row["meanabs_vs_fp32"] = float(err_ref.mean())
            row["budget_vs_fp32"] = budget
            row["compile_s"] = round(time.perf_counter() - t0, 1)
            dt = _timed(kfn, x, iters=args.iters)
            row["ms_per_call"] = round(dt * 1e3, 3)
            row["img_per_s"] = round(n_img / dt, 1)
            row["pass"] = bool(row["maxabs_vs_fp32"] < budget)
        except Exception as e:
            row["pass"] = False
            row["error"] = f"{type(e).__name__}: {e}"[:300]
        print(json.dumps(row), flush=True)
        rows.append(row)

    if only:
        # --only reruns a subset: merge into the existing artifact so the
        # matrix stays complete (order preserved from build_families)
        try:
            with open(args.out) as f:
                old = {r["family"]: r for r in json.load(f)["rows"]}
        except (OSError, ValueError, KeyError):
            old = {}
        old.update({r["family"]: r for r in rows})
        rows = [old[n] for n in fams if n in old]
    out = {"device": str(dev), "batch": args.batch, "size": args.size,
           "rows": rows, "all_pass": all(r.get("pass") for r in rows)}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"-> {args.out}  all_pass={out['all_pass']}")


if __name__ == "__main__":
    main()
