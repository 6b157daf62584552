"""Import PyTorch ``.pth`` checkpoints into JAX pytrees.

The reference saves per-network ``state_dict`` files (``{epoch}_net_{label}.pth``
under ``checkpoints/<name>/``; ``p2pHD/models/base_model.py:42-47``,
``CycleGAN/train.py:281-290``). To let existing trained checkpoints run on the
TPU framework, these helpers read a ``.pth`` (torch is baked in, CPU-only) and
transpose weights into our NHWC/HWIO layouts:

  * Conv2d weight          OIHW → HWIO
  * ConvTranspose2d weight (in,out,kh,kw) → HWIO (I=in, O=out; unflipped —
    :func:`cistar_tpu.ops.nn.conv_transpose2d` flips internally)
  * Linear weight          (out,in) → (in,out)

Model-specific key mapping lives alongside each model family (the flat
state-dict → structured-params renamers); this module provides the mechanics.
Also supports the tolerant partial-load semantics of
``p2pHD/models/base_model.py:50-88`` (ignore missing/excess keys, keep
size-mismatched entries at their initialized values).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional

import numpy as np


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint into a flat {key: np.ndarray} dict."""
    import torch  # local import: torch is only needed for conversion

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = np.asarray(v)
    return out


def conv_w(arr: np.ndarray) -> np.ndarray:
    """OIHW → HWIO."""
    return np.ascontiguousarray(np.transpose(arr, (2, 3, 1, 0)))


def conv_transpose_w(arr: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (in, out, kh, kw) → HWIO with I=in, O=out."""
    return np.ascontiguousarray(np.transpose(arr, (2, 3, 0, 1)))


def linear_w(arr: np.ndarray) -> np.ndarray:
    """(out, in) → (in, out)."""
    return np.ascontiguousarray(arr.T)


def merge_partial(init_params: Dict[str, Any], loaded: Dict[str, Any],
                  log: Optional[Callable[[str], None]] = None) -> Dict[str, Any]:
    """Tolerant merge: take loaded values where the key exists and shapes match.

    Mirrors the drift-tolerant load of ``p2pHD/models/base_model.py:50-88``:
    missing keys keep initialized values, excess keys are dropped, and
    size-mismatched tensors are skipped (with a note).
    """
    import jax

    flat_init = _flatten("", init_params)
    flat_loaded = _flatten("", loaded)
    merged = dict(flat_init)
    for k, v in flat_loaded.items():
        if k not in flat_init:
            if log:
                log(f"skip extra key {k}")
            continue
        if tuple(np.shape(v)) != tuple(np.shape(flat_init[k])):
            if log:
                log(f"shape mismatch for {k}: {np.shape(v)} vs {np.shape(flat_init[k])}")
            continue
        merged[k] = v
    return _unflatten(merged)


def _flatten(prefix: str, tree: Mapping[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            out.update(_flatten(key, v))
        else:
            out[key] = v
    return out


def _unflatten(flat: Dict[str, Any]) -> Dict[str, Any]:
    root: Dict[str, Any] = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return root
