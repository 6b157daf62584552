"""Dtype policy for TPU execution.

The reference runs fp32 by default with optional apex AMP O1 / fp16 inference
(``p2pHD/train.py:66-68``, ``p2pHD/test.py:45-48``; TensorRT fp16/int8 modes in
``p2pHD/run_engine.py:123-132``). On TPU the native fast dtype is bfloat16 on
the MXU with fp32 accumulation, so the policy here is:

  * parameters, optimizer state:        float32
  * activations / matmul inputs:        bfloat16 (policy "bf16") or float32
  * normalization statistics, losses:   float32 always

A :class:`Policy` is threaded through models as the ``dtype`` argument.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Compute/parameter dtype pair, named like JMP policies."""

    compute_dtype: jnp.dtype
    param_dtype: jnp.dtype

    def cast_to_compute(self, tree):
        import jax

        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_to_param(self, tree):
        import jax

        return jax.tree.map(
            lambda x: x.astype(self.param_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


_POLICIES = {
    "fp32": Policy(jnp.float32, jnp.float32),
    "bf16": Policy(jnp.bfloat16, jnp.float32),
    "full_bf16": Policy(jnp.bfloat16, jnp.bfloat16),
}


def get_policy(name: str) -> Policy:
    """Look up a policy by name: "fp32", "bf16" (default train/infer), "full_bf16"."""
    try:
        return _POLICIES[name]
    except KeyError:
        raise ValueError(f"unknown dtype policy {name!r}; options: {sorted(_POLICIES)}")
