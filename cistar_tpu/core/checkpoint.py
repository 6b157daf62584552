"""Checkpoint save/load: Orbax (when available) + portable ``.npz`` pytrees,
plus converters from the reference's PyTorch checkpoint layouts.

Reference semantics being matched (SURVEY.md §5 checkpoint/resume):
  * CycleGAN saves per-epoch ``{epoch}_net{G,D}_*.pth`` plus unversioned
    latest copies; ``--resume`` reloads only the four latest network files
    (optimizers restart) (``CycleGAN/train.py:102-107,281-290``).
  * p2pHD saves ``{epoch}_net_{label}.pth`` under ``checkpoints/<name>/`` with
    tolerant partial loading (``p2pHD/models/base_model.py:42-88``) and an
    ``iter.txt`` with ``(epoch, iter)`` for crash-resume
    (``p2pHD/train.py:40-46,138-141``).

Our native format is a flat ``.npz`` per network (keys are ``/``-joined pytree
paths) — portable, append-free, and loadable without JAX. Orbax async
checkpointing can be layered on for large multi-host runs; at this model scale
(< 50 MB nets) synchronous ``.npz`` is simpler and faster.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

from cistar_tpu.core.torch_import import _flatten, _unflatten


def save_pytree(path: str, tree: Any) -> None:
    flat = _flatten("", jax.tree.map(np.asarray, tree))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_pytree(path: str) -> Any:
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    return _unflatten(flat)


def load_pytree_like(path: str, like: Any) -> Any:
    """Load an ``.npz`` pytree and cast leaves onto the devices/dtypes of
    ``like`` (structure must match)."""
    import jax.numpy as jnp

    loaded = load_pytree(path)
    flat_l = _flatten("", loaded)
    flat_t = _flatten("", jax.tree.map(np.asarray, like))
    missing = set(flat_t) - set(flat_l)
    if missing:
        raise ValueError(f"checkpoint {path} missing keys: {sorted(missing)[:5]} ...")
    out = {k: jnp.asarray(flat_l[k]).astype(flat_t[k].dtype) for k in flat_t}
    return _unflatten(out)


# --------------------------------------------------------------------------- #
# CycleGAN state I/O (reference file-layout parity)
# --------------------------------------------------------------------------- #
_CG_NETS = ["netG_A2B", "netG_B2A", "netD_A", "netD_B"]
_CG_FIELDS = ["g_a2b", "g_b2a", "d_a", "d_b"]


def save_cyclegan_state(out_dir: str, state, epoch: Optional[int] = None) -> None:
    """Per-epoch + latest copies, like ``CycleGAN/train.py:281-290``."""
    for net, field in zip(_CG_NETS, _CG_FIELDS):
        tree = getattr(state, field)
        if epoch is not None:
            save_pytree(os.path.join(out_dir, f"{epoch}_{net}.npz"), tree)
        save_pytree(os.path.join(out_dir, f"{net}.npz"), tree)


def load_cyclegan_state(out_dir: str, state):
    """Reload the four latest nets (optimizer state restarts, like the
    reference's ``--resume``)."""
    updates = {}
    for net, field in zip(_CG_NETS, _CG_FIELDS):
        path = os.path.join(out_dir, f"{net}.npz")
        updates[field] = load_pytree_like(path, getattr(state, field))
    return state._replace(**updates)


# --------------------------------------------------------------------------- #
# p2pHD-style labelled checkpoints + iter.txt resume
# --------------------------------------------------------------------------- #
def save_network(save_dir: str, label: str, epoch_label, tree: Any) -> None:
    """``{epoch}_net_{label}.npz`` under ``save_dir`` (p2pHD layout)."""
    save_pytree(os.path.join(save_dir, f"{epoch_label}_net_{label}.npz"), tree)


def load_network(save_dir: str, label: str, epoch_label, like: Any,
                 strict: bool = False) -> Any:
    path = os.path.join(save_dir, f"{epoch_label}_net_{label}.npz")
    if strict:
        return load_pytree_like(path, like)
    # tolerant partial merge (p2pHD base_model.py:50-88)
    from cistar_tpu.core.torch_import import merge_partial

    loaded = load_pytree(path)
    merged = merge_partial(jax.tree.map(np.asarray, like), loaded)
    import jax.numpy as jnp

    flat_t = _flatten("", jax.tree.map(np.asarray, like))
    flat_m = _flatten("", merged)
    return _unflatten({k: jnp.asarray(flat_m[k]).astype(flat_t[k].dtype)
                       for k in flat_t})


def save_iter(save_dir: str, epoch: int, it: int) -> None:
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, "iter.txt"), "w") as f:
        f.write(f"{epoch},{it}")


def load_iter(save_dir: str) -> Tuple[int, int]:
    path = os.path.join(save_dir, "iter.txt")
    if not os.path.exists(path):
        return 1, 0
    with open(path) as f:
        epoch, it = f.read().strip().split(",")
    return int(epoch), int(it)


# --------------------------------------------------------------------------- #
# Orbax backend (async, multi-host-capable) — optional alternative to .npz
# --------------------------------------------------------------------------- #
def save_orbax(path: str, tree: Any) -> None:
    """Save a pytree with Orbax (for large-scale runs wanting async/multi-host
    checkpointing; the .npz path remains the default at this model scale)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), jax.tree.map(np.asarray, tree), force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, like: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path),
                         target=jax.tree.map(np.asarray, like))
