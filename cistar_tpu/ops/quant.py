"""Int8 quantized inference — the TensorRT-int8 role, TPU-native.

The reference exposes int8 TensorRT engines (``p2pHD/run_engine.py:160-165``,
``test.py:45-48``). On v5e the MXU runs int8×int8→int32 at twice the bf16
rate, so the analogous speed tier here is:

  * weights: static per-output-channel symmetric int8 (quantized once,
    :func:`quantize_conv_tree`),
  * activations: dynamic per-tensor symmetric int8 computed inside the jitted
    step (cheap max-reduction; activations are well-conditioned after
    instance norm),
  * convs: ``lax.conv_general_dilated`` on int8 operands with int32
    accumulation, dequantized into the fp32 epilogue (IN/ReLU as usual).

:func:`resnet_generator_int8_apply` runs the CycleGAN ResNet generator from a
quantized tree; fidelity vs the bf16 path is measured with the LPIPS-style
metric (see STATUS.md).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from cistar_tpu.ops import nn as tnn


def quantize_weight_int8(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8 quantization of an HWIO kernel."""
    absmax = jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale.reshape(-1)  # (O,)


def quantize_conv_tree(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize every conv kernel in a params tree; biases stay fp32."""

    def walk(node):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 4:
                wq, scale = quantize_weight_int8(jnp.asarray(node["w"]))
                out = {"wq": wq, "scale": scale}
                if "b" in node:
                    out["b"] = jnp.asarray(node["b"])
                return out
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def _quantize_act(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    absmax = jnp.max(jnp.abs(x))
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def int8_conv2d(x: jnp.ndarray, q: Dict[str, jnp.ndarray], stride: int = 1,
                padding="same-zero") -> jnp.ndarray:
    """Dynamic-activation int8 conv with fp32 dequantized output."""
    xq, x_scale = _quantize_act(x.astype(jnp.float32))
    k = q["wq"].shape[0]
    p = (k - 1) // 2 if padding == "same-zero" else 0
    acc = lax.conv_general_dilated(
        xq, q["wq"], window_strides=(stride, stride),
        padding=[(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (x_scale * q["scale"])
    if "b" in q:
        out = out + q["b"]
    return out


def int8_conv_transpose2d(x: jnp.ndarray, q: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """k3/s2/p1/op1 transpose conv on int8 operands."""
    xq, x_scale = _quantize_act(x.astype(jnp.float32))
    w_flip = jnp.flip(q["wq"], axis=(0, 1))
    acc = lax.conv_general_dilated(
        xq, w_flip, window_strides=(1, 1), padding=[(1, 2), (1, 2)],
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (x_scale * q["scale"])
    if "b" in q:
        out = out + q["b"]
    return out


def int8_conv2d_reflect(x: jnp.ndarray, q: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Reflect-padded stride-1 conv: quantize once, pad the int8 activations
    (reflection of quantized values ≡ quantization of reflected values)."""
    xq, x_scale = _quantize_act(x.astype(jnp.float32))
    k = q["wq"].shape[0]
    p = (k - 1) // 2
    xq = jnp.pad(xq, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    acc = lax.conv_general_dilated(
        xq, q["wq"], window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (x_scale * q["scale"])
    if "b" in q:
        out = out + q["b"]
    return out


def resnet_generator_int8_apply(qparams: Dict[str, Any], x: jnp.ndarray,
                                n_residual_blocks: int = 9) -> jnp.ndarray:
    """Int8 forward of ``models.cyclegan.ResnetGenerator`` (same param tree,
    quantized with :func:`quantize_conv_tree`)."""
    h = int8_conv2d_reflect(x, qparams["init_conv"])
    h = tnn.relu(tnn.instance_norm(h))
    for i in range(3):
        h = int8_conv2d(h, qparams[f"down_{i}"], stride=2)
        h = tnn.relu(tnn.instance_norm(h))
    for i in range(n_residual_blocks):
        blk = qparams[f"res_{i}"]
        r = int8_conv2d_reflect(h, blk["conv1"])
        r = tnn.relu(tnn.instance_norm(r))
        r = int8_conv2d_reflect(r, blk["conv2"])
        h = h + tnn.instance_norm(r)
    for i in range(3):
        h = int8_conv_transpose2d(h, qparams[f"up_{i}"])
        h = tnn.relu(tnn.instance_norm(h))
    h = int8_conv2d_reflect(h, qparams["out_conv"])
    return tnn.tanh(h)
