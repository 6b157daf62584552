"""Fused-kernel inference forwards (same param trees as the linen models).

Inference-only fast paths: the residual-block conv+IN+ReLU(+skip) runs in the
Pallas megakernel (``ops.pallas_kernels.fused_conv3x3_in_act``).

Measured honestly: the kernel is 29% faster than the STANDALONE XLA
composition at the res-block shape (7.9 vs 11.1 ms at batch 256, ~80% of the
bf16 MXU roofline), but the FULL-model throughput matches the default linen
path (1274 vs 1273 img/s) — inside the whole graph XLA already reaches the
same per-layer efficiency via cross-layer fusion. These forwards therefore
ship as an alternative (useful when layers run standalone, e.g. partial
re-synthesis or layer-wise profiling), not as the default. They consume the
exact same checkpoint trees as the linen models.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp

from cistar_tpu.ops import nn as tnn
from cistar_tpu.ops.pallas_kernels import fused_conv3x3_in_act


#: Bump when the compiled int8-engine program changes (new default kernels,
#: restructured stages): callers that key disk EXECUTABLE caches (bench.py,
#: the CLIs) include this so a code change can never silently reload a
#: pre-change binary under the same shape/options fingerprint.
ENGINE_REV = 6

# Experimental-kernel env flags are read ONCE at import (process-lifetime
# semantics): the engines jit and AOT-export these forwards, so a mid-process
# flip would otherwise silently reuse the stale trace / baked-in executable.
# bench.py additionally keys its disk executable cache on both values.
_FUSED_STAGE_IN = os.environ.get("CISTAR_FUSED_STAGE_IN", "")
_HEAD_KERNEL = os.environ.get("CISTAR_HEAD_KERNEL", "")


def _stage_in_relu(h: jnp.ndarray) -> jnp.ndarray:
    """Stage IN+ReLU for the int8 engines' bf16 XLA segments.

    ``CISTAR_FUSED_STAGE_IN=1`` routes it through the single-pass Pallas IN
    kernel: between Pallas custom calls XLA cannot fuse the IN statistics
    reduce into anything, so each stage norm costs ~3 HBM passes; the fused
    kernel does 2 (one read, one write). Measured 5.4% SLOWER end-to-end in
    round 4 (whole-image grid steps serialize traffic XLA overlaps) — kept
    default-off."""
    if _FUSED_STAGE_IN == "1":
        from cistar_tpu.ops.pallas_kernels import fused_instance_norm_act
        return fused_instance_norm_act(h, act="relu")
    return tnn.relu(tnn.instance_norm(h))


#: Head-conv variants: "shift" (stride-8 shift-channel conv, the round-5
#: default — replaces the 16.5 ms cout=1 fusion with a ~3 ms full-lane MXU
#: conv), "xla" (the plain reflect-conv fusion, pre-round-5 behavior),
#: "tap_matmul" (round-5 Pallas (8,128)-tap kernel — compiles, correct, but
#: measured slower than "shift"), "loop"/"maskedloop"/"masked" (round-4
#: probes; wedge Mosaic at flagship shapes).
_HEAD_VARIANTS = ("", "shift", "xla", "tap_matmul", "loop", "maskedloop",
                  "masked")


def _head_conv_tanh(h: jnp.ndarray, p: Dict[str, Any],
                    raw_in: bool = False) -> jnp.ndarray:
    """Final 7×7 reflect conv → 1 channel + tanh.

    One output channel uses 1/128 MXU lanes, making the plain conv the
    single most expensive op in the headline int8 engine (16.5 ms of 117 ms
    at 256²/batch 256). Default is the stride-8 shift-channel reformulation
    (``ops.head_conv.head_conv_tanh_shift``) whenever the shape allows;
    ``CISTAR_HEAD_KERNEL`` overrides (see ``_HEAD_VARIANTS``).

    ``raw_in=True``: ``h`` is the last upsample stage's RAW conv output —
    its IN+ReLU still pending. The default variant then fuses the
    normalize+ReLU into the head conv's input expression
    (``head_conv_tanh_shift_prenorm``) instead of materializing a
    standalone 2-pass normalize (6.4 ms at the flagship shape); non-default
    variants apply the stage norm here and proceed unfused."""
    variant = _HEAD_KERNEL
    if variant not in _HEAD_VARIANTS:
        raise ValueError(
            f"CISTAR_HEAD_KERNEL={variant!r} is not a known head-conv "
            f"variant; valid values: {', '.join(v for v in _HEAD_VARIANTS if v)}")
    w = p["w"]
    is7 = w.shape[:1] == (7,) and w.shape[3] == 1
    if raw_in:
        shift_ok = (variant == "" and is7
                    and h.shape[1] % 8 == 0 and h.shape[2] % 8 == 0
                    and h.shape[1] > 16 and h.shape[2] > 16)
        if shift_ok:
            from cistar_tpu.ops.head_conv import head_conv_tanh_shift_prenorm
            mean, rsigma = tnn.instance_norm_stats(h)
            return head_conv_tanh_shift_prenorm(h, mean, rsigma, w,
                                                p.get("b"), act="tanh")
        h = _stage_in_relu(h)
    if variant in ("loop", "maskedloop", "masked") and is7:
        from cistar_tpu.ops.pallas_kernels import (
            conv2d_reflect_cout1_loop, conv2d_reflect_cout1_masked)
        fn = conv2d_reflect_cout1_masked if variant == "masked" \
            else conv2d_reflect_cout1_loop
        return fn(h, w, p.get("b"), act="tanh")
    if variant == "tap_matmul" and is7:
        from cistar_tpu.ops.head_conv import head_conv_tanh_pallas
        return head_conv_tanh_pallas(h, w, p.get("b"), act="tanh")
    if variant in ("", "shift") and is7 \
            and h.shape[1] % 8 == 0 and h.shape[2] % 8 == 0:
        from cistar_tpu.ops.head_conv import head_conv_tanh_shift
        return head_conv_tanh_shift(h, w, p.get("b"), act="tanh")
    return tnn.tanh(tnn.conv2d_reflect(h, w, p.get("b")))


def resnet_generator_fast_apply(params: Dict[str, Any], x: jnp.ndarray,
                                n_residual_blocks: int = 9) -> jnp.ndarray:
    """Fast forward of ``models.cyclegan.ResnetGenerator`` (same params)."""
    p = params["init_conv"]
    h = tnn.conv2d_reflect(x, p["w"], p.get("b"))
    h = tnn.relu(tnn.instance_norm(h))
    for i in range(3):
        p = params[f"down_{i}"]
        h = tnn.conv2d(h, p["w"], p.get("b"), stride=2, padding=1)
        h = tnn.relu(tnn.instance_norm(h))
    for i in range(n_residual_blocks):
        blk = params[f"res_{i}"]
        r = fused_conv3x3_in_act(h, blk["conv1"]["w"], blk["conv1"].get("b"),
                                 act="relu", pad_mode="reflect")
        h = fused_conv3x3_in_act(r, blk["conv2"]["w"], blk["conv2"].get("b"),
                                 act="none", residual=h, pad_mode="reflect")
    for i in range(3):
        p = params[f"up_{i}"]
        h = tnn.conv_transpose2d(h, p["w"], p.get("b"), stride=2, padding=1,
                                 output_padding=1)
        h = tnn.relu(tnn.instance_norm(h))
    p = params["out_conv"]
    h = tnn.conv2d_reflect(h, p["w"], p.get("b"))
    return tnn.tanh(h)


def resnet_generator_int8_trunk_apply(params: Dict[str, Any],
                                      qblocks, x: jnp.ndarray,
                                      n_residual_blocks: int = 9,
                                      int8_carrier: str = "bf16",
                                      expect_kernel: bool = False,
                                      force_emulate: bool = False) -> jnp.ndarray:
    """ResnetGenerator forward with the residual trunk on the int8 MXU.

    Stem/downsample/upsample layers run bf16 under XLA; the 9 res blocks —
    ~70% of the model's MACs — run in the fused int8 Pallas megakernel
    (``ops.quant_pallas``), which the v5e MXU executes at ~1.7× the bf16
    rate. ``qblocks`` comes from ``quant_pallas.quantize_resnet_trunk`` over
    the same param tree. This is the TRT-int8-role fast inference engine.

    Stem/head use the plain reflect conv, NOT ``conv2d_reflect_thin``: at
    the flagship shape (256², batch 256) the thin im2col stem/head drops
    the whole engine from 1964.7 to 1141.8 img/s on the v5e chip (the k²=49
    column stack at full resolution × large batch is pure HBM traffic) —
    this was the round-2 driver-bench regression. Thin convs stay on the
    512²/small-batch pix2pixHD engines where they measured faster.
    """
    from cistar_tpu.ops.quant_pallas import (resblock_chain_int8,
                                             resblock_chain_int8_bf16io)

    p = params["init_conv"]
    h = tnn.conv2d_reflect(x, p["w"], p.get("b"))
    h = _stage_in_relu(h)
    for i in range(3):
        p = params[f"down_{i}"]
        h = tnn.conv2d(h, p["w"], p.get("b"), stride=2, padding=1)
        h = _stage_in_relu(h)
    chain = resblock_chain_int8_bf16io if int8_carrier == "bf16" \
        else resblock_chain_int8
    h = chain(h, qblocks, expect_kernel=expect_kernel,
              force_emulate=force_emulate)
    for i in range(3):
        p = params[f"up_{i}"]
        h = tnn.conv_transpose2d(h, p["w"], p.get("b"), stride=2, padding=1,
                                 output_padding=1)
        if i < 2:
            h = _stage_in_relu(h)
    # last stage norm rides inside the head conv (raw_in) — see _head_conv_tanh
    return _head_conv_tanh(h, params["out_conv"], raw_in=True)


def global_generator_fast_apply(params: Dict[str, Any], x: jnp.ndarray,
                                n_downsampling: int = 3,
                                n_blocks: int = 9) -> jnp.ndarray:
    """Fast forward of ``models.pix2pixhd.GlobalGenerator`` (same params)."""
    trunk = params["trunk"]
    p = trunk["stem"]["conv"]
    h = tnn.conv2d_reflect(x, p["w"], p.get("b"))
    h = tnn.relu(tnn.instance_norm(h))
    for i in range(n_downsampling):
        p = trunk[f"down_{i}"]["conv"]
        h = tnn.conv2d(h, p["w"], p.get("b"), stride=2, padding=1)
        h = tnn.relu(tnn.instance_norm(h))
    for i in range(n_blocks):
        blk = trunk[f"res_{i}"]
        r = fused_conv3x3_in_act(h, blk["conv1"]["w"], blk["conv1"].get("b"),
                                 act="relu", pad_mode="reflect")
        h = fused_conv3x3_in_act(r, blk["conv2"]["w"], blk["conv2"].get("b"),
                                 act="none", residual=h, pad_mode="reflect")
    for i in range(n_downsampling):
        p = trunk[f"up_{i}"]["convt"]
        h = tnn.conv_transpose2d(h, p["w"], p.get("b"), stride=2, padding=1,
                                 output_padding=1)
        h = tnn.relu(tnn.instance_norm(h))
    p = params["head"]["conv"]
    h = tnn.conv2d_reflect(h, p["w"], p.get("b"))
    return tnn.tanh(h)


def global_generator_int8_trunk_apply(params: Dict[str, Any], qblocks,
                                      x: jnp.ndarray,
                                      n_downsampling: int = 4,
                                      n_blocks: int = 9,
                                      cout_tile=None,
                                      expect_kernel: bool = False) -> jnp.ndarray:
    """GlobalGenerator forward with the res trunk on the int8 MXU.

    The reference's TensorRT-int8 engine is exactly this network
    (``p2pHD/run_engine.py:160-165`` runs the exported pix2pixHD generator).
    At the default width (ngf 64, 4 downsamplings → 1024-channel trunk) the
    per-block weights exceed VMEM, so the trunk dispatches to the cout-tiled
    two-kernel chain (``quant_pallas.resblock_chain_int8_tiled``); narrower
    configs whose blocks fit whole-image use the fused single kernel.
    ``qblocks`` comes from ``quant_pallas.quantize_global_trunk`` over the
    same param tree.

    Measured (v5e chip, 512², ngf 64, nd 4, batch 16; results_r3.json): 263 img/s vs 212
    bf16-XLA (1.24×); cout_tile auto-selected by the VMEM model
    (quant_pallas.pick_cout_tile).
    """
    from cistar_tpu.ops.quant_pallas import (resblock_chain_int8_bf16io,
                                             resblock_chain_int8_tiled,
                                             whole_image_resblock_fits)

    trunk = params["trunk"]
    p = trunk["stem"]["conv"]
    h = tnn.conv2d_reflect_thin(x, p["w"], p.get("b"))
    h = tnn.relu(tnn.instance_norm(h))
    for i in range(n_downsampling):
        p = trunk[f"down_{i}"]["conv"]
        h = tnn.conv2d(h, p["w"], p.get("b"), stride=2, padding=1)
        h = tnn.relu(tnn.instance_norm(h))
    if whole_image_resblock_fits(h.shape[1], h.shape[2], h.shape[-1]):
        h = resblock_chain_int8_bf16io(h, qblocks, expect_kernel=expect_kernel)
    else:
        h = resblock_chain_int8_tiled(h, qblocks, cout_tile=cout_tile,
                                      expect_kernel=expect_kernel)
    for i in range(n_downsampling):
        p = trunk[f"up_{i}"]["convt"]
        h = tnn.conv_transpose2d(h, p["w"], p.get("b"), stride=2, padding=1,
                                 output_padding=1)
        h = tnn.relu(tnn.instance_norm(h))
    p = params["head"]["conv"]
    h = tnn.conv2d_reflect_thin(h, p["w"], p.get("b"))
    return tnn.tanh(h)


def quantize_unet_msrb(params: Dict[str, Any], n_blocks: int = 3):
    """Quantize the MSRB trunk of a ``UNetGeneratorHD`` param tree."""
    from cistar_tpu.ops.quant_pallas import quantize_msrb

    return [quantize_msrb(params[f"msrb_{i}"]) for i in range(n_blocks)]


def unet_msrb_int8_apply(params: Dict[str, Any], qblocks, x: jnp.ndarray,
                         n_blocks: int = 3, cout_tile: int = 128,
                         expect_kernel: bool = False) -> jnp.ndarray:
    """``UNetGeneratorHD`` forward with the MSRB trunk on the int8 MXU.

    The shipped ``r2l_MSRB*`` deployment model (``networks.py:947-1055``):
    stem/downs/ups/head run bf16 XLA; the 3 MSRB blocks — the bulk of the
    MACs at the bottleneck — run as dual-branch int8 stage kernels
    (``quant_pallas.msrb_block_int8``). Same param tree as the linen model.

    Measured (v5e chip, 512², ngf 64, batch 8; results_r3.json): 176 img/s vs 112 bf16-XLA
    (1.58×).
    """
    from cistar_tpu.ops.quant_pallas import msrb_block_int8

    p = params["init_block"]["conv"]
    h = tnn.conv2d_reflect_thin(x, p["w"], p.get("b"))
    h = tnn.relu(tnn.instance_norm(h))
    skips = []
    for i in range(3):
        p = params[f"down_{i}_conv"]
        h = tnn.conv2d(h, p["w"], p.get("b"), stride=2, padding=3)
        h = tnn.relu(tnn.instance_norm(h))
        skips.append(h)
    for i in range(n_blocks):
        h = msrb_block_int8(h, qblocks[i], cout_tile=cout_tile,
                            expect_kernel=expect_kernel)
    for i in range(3):
        skip = skips[2 - i]
        h = jnp.concatenate([h, skip], axis=-1)
        p = params[f"up_{i}_convt"]
        h = tnn.conv_transpose2d(h, p["w"], p.get("b"), stride=2, padding=1,
                                 output_padding=1)
        h = tnn.relu(tnn.instance_norm(h))
    p = params["output_layer"]["conv"]
    h = tnn.conv2d_reflect_thin(h, p["w"], p.get("b"))
    return tnn.tanh(h)


def quantize_local_enhancer(params: Dict[str, Any], n_blocks_global: int = 9):
    """Quantize the global-trunk res blocks of a ``LocalEnhancer`` tree."""
    from cistar_tpu.ops.quant_pallas import quantize_resblock

    return [quantize_resblock(params["global"][f"res_{i}"])
            for i in range(n_blocks_global)]


def local_enhancer_int8_apply(params: Dict[str, Any], qblocks, x: jnp.ndarray,
                              n_downsample_global: int = 3,
                              n_blocks_global: int = 9,
                              n_local_enhancers: int = 1,
                              n_blocks_local: int = 3,
                              cout_tile=None,
                              expect_kernel: bool = False) -> jnp.ndarray:
    """``LocalEnhancer`` forward (the 1024² coarse-to-fine generator) with
    the global trunk's res blocks on the int8 MXU.

    The enhancer-stream res blocks run at full resolution with few channels
    (512²×64 at the 1024² config) — bandwidth-bound, tiny weights — so they
    stay bf16 XLA; the global bottleneck trunk carries most of the MACs and
    dispatches to the whole-image or cout-tiled int8 chain by VMEM fit.

    Measured (v5e chip, 1024², ngf 32, batch 4; results_r3_local1024.json):
    35.7 vs 24.8 img/s bf16 (1.44×).
    """
    from cistar_tpu.ops.quant_pallas import (resblock_chain_int8_bf16io,
                                             resblock_chain_int8_tiled,
                                             whole_image_resblock_fits)

    pyramid = [x]
    for _ in range(n_local_enhancers):
        pyramid.append(tnn.avg_pool2d(pyramid[-1], 3, 2, padding=1,
                                      count_include_pad=False))

    g = params["global"]
    p = g["stem"]["conv"]
    h = tnn.conv2d_reflect_thin(pyramid[-1], p["w"], p.get("b"))
    h = tnn.relu(tnn.instance_norm(h))
    for i in range(n_downsample_global):
        p = g[f"down_{i}"]["conv"]
        h = tnn.conv2d(h, p["w"], p.get("b"), stride=2, padding=1)
        h = tnn.relu(tnn.instance_norm(h))
    if whole_image_resblock_fits(h.shape[1], h.shape[2], h.shape[-1]):
        h = resblock_chain_int8_bf16io(h, qblocks, expect_kernel=expect_kernel)
    else:
        h = resblock_chain_int8_tiled(h, qblocks, cout_tile=cout_tile,
                                      expect_kernel=expect_kernel)
    for i in range(n_downsample_global):
        p = g[f"up_{i}"]["convt"]
        h = tnn.conv_transpose2d(h, p["w"], p.get("b"), stride=2, padding=1,
                                 output_padding=1)
        h = tnn.relu(tnn.instance_norm(h))

    for n in range(1, n_local_enhancers + 1):
        inp = pyramid[n_local_enhancers - n]
        p = params[f"enh{n}_stem"]["conv"]
        d = tnn.conv2d_reflect_thin(inp, p["w"], p.get("b"))
        d = tnn.relu(tnn.instance_norm(d))
        p = params[f"enh{n}_down"]["conv"]
        d = tnn.conv2d(d, p["w"], p.get("b"), stride=2, padding=1)
        d = tnn.relu(tnn.instance_norm(d))
        h = d + h
        for i in range(n_blocks_local):
            blk = params[f"enh{n}_res_{i}"]
            r = tnn.conv2d_reflect(h, blk["conv1"]["w"], blk["conv1"].get("b"))
            r = tnn.relu(tnn.instance_norm(r))
            r = tnn.conv2d_reflect(r, blk["conv2"]["w"], blk["conv2"].get("b"))
            h = h + tnn.instance_norm(r)
        p = params[f"enh{n}_up"]["convt"]
        h = tnn.conv_transpose2d(h, p["w"], p.get("b"), stride=2, padding=1,
                                 output_padding=1)
        h = tnn.relu(tnn.instance_norm(h))
        if n == n_local_enhancers:
            p = params["head"]["conv"]
            h = tnn.conv2d_reflect_thin(h, p["w"], p.get("b"))
            h = tnn.tanh(h)
    return h


def _multi_atrous_conv(p: Dict[str, Any], x: jnp.ndarray, stride: int = 1,
                       rates=(2, 4, 6, 8)) -> jnp.ndarray:
    """bf16 ``MultiAtrousConv``: 4 dilated conv branches, IN+ReLU, summed
    (``CycleGAN/models.py:329-359``)."""
    out = None
    for i, r in enumerate(rates):
        b = p[f"b{i}_conv"]
        h = tnn.conv2d(x, b["w"], b.get("b"), stride=stride, padding=r,
                       dilation=r)
        h = tnn.relu(tnn.instance_norm(h))
        out = h if out is None else out + h
    return out


def _stage_kernel_fits(h: jnp.ndarray, qstage) -> bool:
    """True when the fused whole-image int8 stage kernel
    (``quant_pallas.multi_atrous_stage_int8``) fits VMEM for this stage's
    post-stride shape; callers keep the bf16 XLA stage otherwise (the
    256x256 first stage of a 512^2 input exceeds the whole-image budget)."""
    from cistar_tpu.ops.quant_pallas import atrous_stage_fits
    _, H, W, C = h.shape
    return atrous_stage_fits(H // 2, W // 2, C, qstage["wbq"].shape[-1])


def _q_parts(qblocks):
    """Back-compat split of a quantized-tree argument: round-4 callers pass
    the bare res-trunk list; round-5 quantizers return a dict that also
    carries the fused encoder stages."""
    if isinstance(qblocks, dict):
        return qblocks["res"], qblocks.get("enc")
    return qblocks, None


def quantize_bilinear_trunk(params: Dict[str, Any],
                            n_residual_blocks: int = 6,
                            down_sample: int = 3):
    """Quantize a ``MultiscaleBilinearGenerator``: the atrous res trunk plus
    (round 5) the ``MultiAtrousConv`` encoder stages, which run as fused
    single-pass int8 stage kernels (``quant_pallas.multi_atrous_stage_int8``
    — the r4 profile showed these thin models are IN/layout-bound, so the
    win is collapsing each stage's ~12 HBM passes into one)."""
    from cistar_tpu.ops.quant_pallas import (quantize_atrous_resblock,
                                             quantize_multi_atrous_stage)

    return {"res": [quantize_atrous_resblock(params[f"res_{i}"])
                    for i in range(n_residual_blocks)],
            "enc": [quantize_multi_atrous_stage(params[f"down_{i}"])
                    for i in range(down_sample)]}


def bilinear_generator_int8_trunk_apply(params: Dict[str, Any], qblocks,
                                        x: jnp.ndarray,
                                        n_residual_blocks: int = 6,
                                        down_sample: int = 3,
                                        expect_kernel: bool = False
                                        ) -> jnp.ndarray:
    """``MultiscaleBilinearGenerator`` (the CLI-default ``bilinear_content``
    family, ``CycleGAN/models.py:547-624``) with its atrous res trunk AND
    (round 5) its encoder stages on the int8 MXU; the bilinear-upsample
    decoder runs bf16 XLA and the 7×7 head uses the shift-channel conv with
    the last stage IN fused (the flagship-engine treatment). Same param
    tree as the linen model."""
    from cistar_tpu.ops.quant_pallas import (atrous_resblock_chain_int8,
                                             multi_atrous_stage_int8)

    qres, qenc = _q_parts(qblocks)
    p = params["init_conv"]
    h = tnn.conv2d_reflect(x, p["w"], p.get("b"))
    h = tnn.relu(tnn.instance_norm(h))
    skips = []
    for i in range(down_sample):
        if qenc is not None and _stage_kernel_fits(h, qenc[i]):
            h = multi_atrous_stage_int8(h, qenc[i],
                                        expect_kernel=expect_kernel)
        else:
            # stage too large for the whole-image VMEM kernel (e.g. the
            # 256x256 first stage at 512^2): keep the bf16 XLA stage
            h = _multi_atrous_conv(params[f"down_{i}"], h, stride=2)
        skips.append(h)
    h = atrous_resblock_chain_int8(h, qres, expect_kernel=expect_kernel)
    for i in range(down_sample):
        skip = skips[down_sample - 1 - i]
        h = jnp.concatenate([h, skip], axis=-1)
        p = params[f"up_{i}"]["conv"]
        # conv ∘ upsample composed into one low-res 4-phase conv (full MXU
        # lanes at these thin widths; no materialized 2x tensor)
        h = tnn.upconv2x_bilinear(h, p["w"], p.get("b"))
        if i < down_sample - 1:
            h = tnn.relu(tnn.instance_norm(h))
    # last stage norm rides inside the head conv — see _head_conv_tanh
    return _head_conv_tanh(h, params["out_conv"], raw_in=True)


def quantize_multiscale_trunk(params: Dict[str, Any],
                              n_residual_blocks: int = 6,
                              down_sample: int = 3):
    """Quantize a ``MultiscaleGenerator`` / ``MultiscaleDenseDecoder``:
    the plain res trunk plus (round 5) the atrous encoder stages (fused
    single-pass int8 stage kernels, see :func:`quantize_bilinear_trunk`)."""
    from cistar_tpu.ops.quant_pallas import (quantize_multi_atrous_stage,
                                             quantize_resblock)

    return {"res": [quantize_resblock(params[f"res_{i}"])
                    for i in range(n_residual_blocks)],
            "enc": [quantize_multi_atrous_stage(params[f"down_{i}"])
                    for i in range(down_sample)]}


def multiscale_generator_int8_trunk_apply(params: Dict[str, Any], qblocks,
                                          x: jnp.ndarray,
                                          n_residual_blocks: int = 6,
                                          down_sample: int = 3,
                                          dense_decoder: bool = True,
                                          expect_kernel: bool = False
                                          ) -> jnp.ndarray:
    """``GeneratorMultiscale(DenseDecoder)`` (``CycleGAN/models.py:222-325``,
    'atrous' family) with the plain res trunk AND (round 5) the atrous
    encoder stages on the int8 MXU. The (dense ConvT or atrous-transpose)
    decoder runs bf16 XLA."""
    from cistar_tpu.ops.quant_pallas import (multi_atrous_stage_int8,
                                             resblock_chain_int8_bf16io)

    qres, qenc = _q_parts(qblocks)
    p = params["init_conv"]
    h = tnn.conv2d_reflect(x, p["w"], p.get("b"))
    h = tnn.relu(tnn.instance_norm(h))
    skips = []
    for i in range(down_sample):
        if qenc is not None and _stage_kernel_fits(h, qenc[i]):
            h = multi_atrous_stage_int8(h, qenc[i],
                                        expect_kernel=expect_kernel)
        else:
            # oversized stage: bf16 XLA (see bilinear apply above)
            h = _multi_atrous_conv(params[f"down_{i}"], h, stride=2)
        skips.append(h)
    h = resblock_chain_int8_bf16io(h, qres, expect_kernel=expect_kernel)
    for i in range(down_sample):
        skip = skips[down_sample - 1 - i]
        h = jnp.concatenate([h, skip], axis=-1)
        up = params[f"up_{i}"]
        if dense_decoder:
            p = up["convt"]
            h = tnn.conv_transpose2d(h, p["w"], p.get("b"), stride=2,
                                     padding=1, output_padding=1)
            if i < down_sample - 1:
                h = tnn.relu(tnn.instance_norm(h))
        else:
            # MultiAtrousTransposeConv: 4 dilated ConvT branches producing
            # C/4 each, IN per branch, concat + ReLU (models.py:361-391)
            outs = []
            for bi, r in enumerate((2, 4, 6, 8)):
                b = up[f"b{bi}_convt"]
                hh = tnn.conv_transpose2d(h, b["w"], b.get("b"), stride=2,
                                          padding=r, output_padding=1,
                                          dilation=r)
                outs.append(tnn.instance_norm(hh))
            h = tnn.relu(jnp.concatenate(outs, axis=-1))
    if dense_decoder:
        # last stage norm rides inside the head conv — see _head_conv_tanh
        return _head_conv_tanh(h, params["out_conv"], raw_in=True)
    return _head_conv_tanh(h, params["out_conv"])


def unet_generator_int8_trunk_apply(params: Dict[str, Any], qblocks,
                                    x: jnp.ndarray,
                                    n_residual_blocks: int = 6,
                                    down_sample: int = 3,
                                    expect_kernel: bool = False
                                    ) -> jnp.ndarray:
    """``UnetGenerator`` (``CycleGAN/models.py:100-181``, the ``train.sh``
    example family) with its plain res trunk on the int8 MXU.

    Same param tree as the linen ``models.cyclegan.UnetGenerator``: strided
    conv encoder and skip-concat transpose decoder run bf16 XLA (the skip
    activations stay bf16 — they feed the 2×-width decoder concat, not the
    quantized trunk); the N bottleneck residual blocks run in the fused int8
    chain (``quant_pallas.resblock_chain_int8_bf16io``). Closes the last
    int8 tier gap (VERDICT r4 #5); quantize with
    :func:`quantize_unet_trunk`."""
    from cistar_tpu.ops.quant_pallas import resblock_chain_int8_bf16io

    qres, _ = _q_parts(qblocks)
    p = params["init_conv"]
    h = tnn.conv2d_reflect(x, p["w"], p.get("b"))
    h = tnn.relu(tnn.instance_norm(h))
    skips = []
    for i in range(down_sample):
        p = params[f"down_{i}"]["conv"]
        h = tnn.conv2d(h, p["w"], p.get("b"), stride=2, padding=1)
        h = tnn.relu(tnn.instance_norm(h))
        skips.append(h)
    h = resblock_chain_int8_bf16io(h, qres, expect_kernel=expect_kernel)
    for i in range(down_sample):
        skip = skips[down_sample - 1 - i]
        h = jnp.concatenate([h, skip], axis=-1)
        p = params[f"up_{i}"]["convt"]
        h = tnn.conv_transpose2d(h, p["w"], p.get("b"), stride=2, padding=1,
                                 output_padding=1)
        if i < down_sample - 1:
            h = tnn.relu(tnn.instance_norm(h))
    # last stage norm rides inside the head conv — see _head_conv_tanh
    return _head_conv_tanh(h, params["out_conv"], raw_in=True)


def quantize_unet_trunk(params: Dict[str, Any], n_residual_blocks: int = 6):
    """Quantize the plain bottleneck res trunk of a ``UnetGenerator``
    (strided-conv encoder — no atrous stages to fuse)."""
    from cistar_tpu.ops.quant_pallas import quantize_resblock

    return [quantize_resblock(params[f"res_{i}"])
            for i in range(n_residual_blocks)]


def quantize_multiscale_global(params: Dict[str, Any], stats: Dict[str, Any],
                               n_blocks: int = 9):
    """Quantize the res trunk of a ``MultiscaleGlobalGenerator`` tree.

    The family runs with the reference's BatchNorm DEFAULT regardless of
    ``opt.norm`` (``networks.py:40`` vs ``:278`` quirk), so the running-stats
    affine is folded into the int8 scale/bias rows
    (``quant_pallas.quantize_resblock_bn``); ``stats`` is the generator's
    ``batch_stats`` tree."""
    from cistar_tpu.ops.quant_pallas import quantize_resblock_bn

    return [quantize_resblock_bn(params[f"res_{i}"], stats[f"res_{i}"])
            for i in range(n_blocks)]


def _bn_affine(p_norm: Dict[str, Any], s_norm: Dict[str, Any],
               v: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Inference BatchNorm: the running-stats per-channel affine
    (``models.pix2pixhd.NormLayer`` batch kind; gamma stored as γ−1)."""
    g = (jnp.asarray(p_norm["gamma"], jnp.float32) + 1.0) \
        * jax.lax.rsqrt(jnp.asarray(s_norm["var"], jnp.float32) + eps)
    b = jnp.asarray(p_norm["beta"], jnp.float32) \
        - jnp.asarray(s_norm["mean"], jnp.float32) * g
    return (v.astype(jnp.float32) * g + b).astype(v.dtype)


def multiscale_global_int8_apply(params: Dict[str, Any], qblocks,
                                 x: jnp.ndarray, stats: Dict[str, Any],
                                 n_blocks: int = 9, cout_tile=None,
                                 expect_kernel: bool = False) -> jnp.ndarray:
    """``MultiscaleGlobalGenerator`` (``networks.py:277-340``) with the
    ngf·8 res trunk on the int8 MXU (BatchNorm folded — ``bn=True`` chains).
    Pyramid stems / fuse convs / upsamples run bf16 XLA with the running-
    stats affine applied explicitly."""
    from cistar_tpu.ops.quant_pallas import (resblock_chain_int8_bf16io,
                                             resblock_chain_int8_tiled,
                                             whole_image_resblock_fits)

    def c7s1(name, v):
        p = params[name]
        h = tnn.conv2d_reflect(v, p["conv"]["w"], p["conv"].get("b"))
        return tnn.relu(_bn_affine(p["norm"], stats[name]["norm"], h))

    def down(name, v):
        p = params[name]
        h = tnn.conv2d(v, p["conv"]["w"], p["conv"].get("b"), stride=2,
                       padding=1)
        return tnn.relu(_bn_affine(p["norm"], stats[name]["norm"], h))

    b1 = down("b1_down", c7s1("b1_stem", x))
    b2_in = tnn.max_pool2d(x, 3, 2, padding=1)
    b3_in = tnn.max_pool2d(b2_in, 3, 2, padding=1)
    b2 = c7s1("feat_stem", b2_in)   # shared stem (reference aliases)
    b3 = c7s1("feat_stem", b3_in)
    b12 = down("connect_b12", jnp.concatenate([b1, b2], axis=-1))
    h = down("connect_b23", jnp.concatenate([b12, b3], axis=-1))
    if whole_image_resblock_fits(h.shape[1], h.shape[2], h.shape[-1]):
        h = resblock_chain_int8_bf16io(h, qblocks, expect_kernel=expect_kernel,
                                       bn=True)
    else:
        h = resblock_chain_int8_tiled(h, qblocks, cout_tile=cout_tile,
                                      expect_kernel=expect_kernel, bn=True)
    for i in range(3):
        p = params[f"up_{i}"]
        h = tnn.conv_transpose2d(h, p["convt"]["w"], p["convt"].get("b"),
                                 stride=2, padding=1, output_padding=1)
        h = tnn.relu(_bn_affine(p["norm"], stats[f"up_{i}"]["norm"], h))
    p = params["head"]["conv"]
    h = tnn.conv2d_reflect(h, p["w"], p.get("b"))
    return tnn.tanh(h)
