"""HBM-bandwidth roofline accounting for the suite train steps.

VERDICT r5 asks for p2phd1024 <= 0.15 s/step *or* a committed proof that the
residual sits at a hardware roofline. The per-op profile
(``benchmarks/profile_train_p2phd1024.json``) is FLAT — top op 4.1%, ~1000
distinct HLO ops — which is the signature of a bandwidth-bound program
(batch 1, 1024^2, 32-64 channels: every conv tensor pass is a full HBM
sweep at trivial arithmetic intensity). This tool compiles the step fresh
(bypassing the executable cache, which strips the cost model), reads XLA's
``cost_analysis()`` flops + bytes accessed, and prints where the measured
step time sits against BOTH rooflines:

    t_mxu = flops / peak_flops        t_hbm = bytes / peak_bw

Reference role: the TRT per-layer profiler's "total" line
(``p2pHD/run_engine.py:54-59``) — except TRT never tells you whether the
total is compute- or bandwidth-limited; this does.

Run (real chip):  python tools/roofline_train.py --config p2phd1024
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

# v5e (v5 lite) single-chip peaks: 197 bf16 TFLOP/s, ~819 GB/s HBM BW.
PEAK_BF16 = 197e12
PEAK_HBM = 819e9


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="p2phd1024",
                   choices=["cyclegan256", "p2phd512", "p2phd1024",
                            "unet512"])
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax.numpy as jnp

    from tools.profile_train import build

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    step, meta = build(args.config, dtype)
    lower = meta.pop("lower", None)
    if lower is None:
        p.error("config has no lower() hook")

    print("compiling fresh for cost analysis (minutes)...", flush=True)
    t0 = time.time()
    compiled = lower().compile()
    print(f"compiled in {time.time() - t0:.0f} s", flush=True)
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    byt = float(ca.get("bytes accessed", 0.0))
    # measured steady-state step time via the cached/step fn already built
    for _ in range(3):
        out = step()
    float(jnp.sum(out["loss_G"]).astype(jnp.float32)) \
        if isinstance(out, dict) else None
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = step()
    # host fetch synchronizes (axon: block_until_ready returns early)
    _ = float(list(out.values())[0]) if isinstance(out, dict) else float(
        jnp.sum(out).astype(jnp.float32))
    t_meas = (time.perf_counter() - t0) / args.iters

    t_mxu = flops / PEAK_BF16
    t_hbm = byt / PEAK_HBM
    rep = {
        "config": args.config, "dtype": args.dtype,
        "flops": flops, "bytes_accessed": byt,
        "arith_intensity_flops_per_byte": flops / byt if byt else None,
        "t_measured_s": round(t_meas, 5),
        "t_mxu_roofline_s": round(t_mxu, 5),
        "t_hbm_roofline_s": round(t_hbm, 5),
        "pct_of_hbm_roofline": round(100 * t_hbm / t_meas, 1),
        "pct_of_mxu_roofline": round(100 * t_mxu / t_meas, 1),
        "bound": "hbm" if t_hbm > t_mxu else "mxu",
    }
    print(json.dumps(rep, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rep, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
