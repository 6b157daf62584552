"""Golden tests for the round-5 cout=1 7x7 head-conv reformulations.

Both structures must be EXACT reformulations of the reference head
(``nn.Conv2d(ngf, 1, 7)`` + reflect pad + tanh — CycleGAN/models.py:24-67,
p2pHD networks.py:195-223), i.e. match ``ops.nn.conv2d_reflect`` within
accumulation tolerance at every shape the engines use them at.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cistar_tpu.ops import nn as tnn
from cistar_tpu.ops.head_conv import (head_conv_tanh_pallas,
                                      head_conv_tanh_shift,
                                      head_conv_tanh_xla)


def _ref(x, w, b, pre_in=False):
    if pre_in:
        x = tnn.relu(tnn.instance_norm(x))
    return tnn.tanh(tnn.conv2d_reflect(x, w, b))


def _mk(rng, n, h, wd, cin, dtype):
    x = jnp.asarray(rng.randn(n, h, wd, cin).astype(np.float32)).astype(dtype)
    w = jnp.asarray(rng.randn(7, 7, cin, 1).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(1).astype(np.float32) * 0.1)
    return x, w, b


@pytest.mark.fast
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(2, 32, 32, 16), (1, 48, 40, 64)])
def test_head_conv_xla_taps_matches_reference(rng, dtype, shape):
    x, w, b = _mk(rng, *shape, dtype)
    got = np.asarray(head_conv_tanh_xla(x, w, b), np.float32)
    want = np.asarray(_ref(x, w, b), np.float32)
    tol = 1e-5 if dtype == jnp.float32 else 5e-3
    assert np.abs(got - want).max() < tol


@pytest.mark.fast
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape,rows", [((2, 32, 32, 16), 32),
                                        ((1, 64, 40, 64), 16),
                                        ((1, 48, 72, 8), 64)])
def test_head_conv_pallas_matches_reference(rng, dtype, shape, rows):
    x, w, b = _mk(rng, *shape, dtype)
    got = np.asarray(head_conv_tanh_pallas(x, w, b, rows=rows,
                                           interpret=True), np.float32)
    want = np.asarray(_ref(x, w, b), np.float32)
    tol = 1e-5 if dtype == jnp.float32 else 5e-3
    assert np.abs(got - want).max() < tol


@pytest.mark.fast
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(2, 32, 32, 16), (1, 64, 40, 64),
                                   (1, 48, 72, 8)])
def test_head_conv_shift_matches_reference(rng, dtype, shape):
    x, w, b = _mk(rng, *shape, dtype)
    got = np.asarray(head_conv_tanh_shift(x, w, b), np.float32)
    want = np.asarray(_ref(x, w, b), np.float32)
    tol = 1e-5 if dtype == jnp.float32 else 5e-3
    assert np.abs(got - want).max() < tol


@pytest.mark.fast
def test_head_conv_shift_under_jit_with_param_weights(rng):
    """w/b as jit ARGUMENTS (the engine call pattern) — the kernel expansion
    must be trace-safe."""
    x, w, b = _mk(rng, 1, 32, 32, 16, jnp.float32)
    got = np.asarray(jax.jit(head_conv_tanh_shift)(x, w, b), np.float32)
    want = np.asarray(_ref(x, w, b), np.float32)
    assert np.abs(got - want).max() < 1e-5


@pytest.mark.fast
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(2, 32, 32, 16), (1, 64, 40, 64),
                                   (1, 48, 72, 8)])
def test_head_conv_shift_prenorm_matches_reference(rng, dtype, shape):
    """Fused IN+ReLU+head (zero-pad main conv + exact reflect border strips)
    vs relu(instance_norm) → reflect conv → tanh."""
    from cistar_tpu.ops.head_conv import head_conv_tanh_shift_prenorm
    x, w, b = _mk(rng, *shape, dtype)
    mean, rsigma = tnn.instance_norm_stats(x)
    got = np.asarray(head_conv_tanh_shift_prenorm(x, mean, rsigma, w, b),
                     np.float32)
    want = np.asarray(_ref(x, w, b, pre_in=True), np.float32)
    tol = 1e-5 if dtype == jnp.float32 else 5e-3
    assert np.abs(got - want).max() < tol


@pytest.mark.fast
def test_head_conv_shift_prenorm_under_jit(rng):
    from cistar_tpu.ops.head_conv import head_conv_tanh_shift_prenorm
    x, w, b = _mk(rng, 1, 32, 32, 16, jnp.float32)
    mean, rsigma = tnn.instance_norm_stats(x)
    got = np.asarray(jax.jit(head_conv_tanh_shift_prenorm)(x, mean, rsigma,
                                                           w, b), np.float32)
    want = np.asarray(_ref(x, w, b, pre_in=True), np.float32)
    assert np.abs(got - want).max() < 1e-5


@pytest.mark.fast
def test_head_conv_pallas_fused_pre_instance_norm(rng):
    x, w, b = _mk(rng, 2, 32, 32, 16, jnp.float32)
    got = np.asarray(head_conv_tanh_pallas(x, w, b, rows=32, pre_in=True,
                                           interpret=True), np.float32)
    want = np.asarray(_ref(x, w, b, pre_in=True), np.float32)
    assert np.abs(got - want).max() < 1e-4


@pytest.mark.fast
def test_head_conv_pallas_no_bias_and_identity_act(rng):
    x, w, _ = _mk(rng, 1, 32, 32, 16, jnp.float32)
    got = np.asarray(head_conv_tanh_pallas(x, w, None, act="none", rows=32,
                                           interpret=True), np.float32)
    want = np.asarray(tnn.conv2d_reflect(x, w, None), np.float32)
    assert np.abs(got - want).max() < 1e-5
