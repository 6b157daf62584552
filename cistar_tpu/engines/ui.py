"""Interactive editing session — the ``UIModel`` role (``p2pHD/models/ui_model.py``).

The reference's UI model supports: loading a (label, instance, feature-map)
triple, changing the label of a clicked object, painting label strokes, adding
copied objects, per-object style switching by sampling cluster centers, and
re-synthesizing only the affected region. Here the same capabilities are pure
functions over numpy/jax arrays plus an :class:`EditSession` that tracks the
current maps and re-runs the jitted generator; "partial" re-synthesis keeps
static shapes by always running the full (compiled, fast) forward and
compositing the edited bounding box — the TPU-friendly equivalent of the
reference's crop-based partial forward.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def change_label(label: np.ndarray, inst: np.ndarray, click_yx: Tuple[int, int],
                 new_label: int) -> Tuple[np.ndarray, np.ndarray]:
    """Reassign the clicked object's label id (and its instance id's label
    thousands-digit convention ``new_label*1000 + k``)."""
    y, x = click_yx
    obj_id = int(inst[y, x])
    mask = inst == obj_id
    label = label.copy()
    inst = inst.copy()
    label[mask] = new_label
    k = obj_id % 1000 if obj_id >= 1000 else 0
    inst[mask] = new_label * 1000 + k if obj_id >= 1000 else new_label
    return label, inst


def add_strokes(label: np.ndarray, inst: np.ndarray, ys: np.ndarray,
                xs: np.ndarray, brush: int, paint_label: int
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Paint square brush strokes of ``paint_label`` along a point path."""
    label = label.copy()
    inst = inst.copy()
    h, w = label.shape[:2]
    r = brush // 2
    for y, x in zip(np.asarray(ys), np.asarray(xs)):
        y0, y1 = max(0, y - r), min(h, y + r + 1)
        x0, x1 = max(0, x - r), min(w, x + r + 1)
        label[y0:y1, x0:x1] = paint_label
        inst[y0:y1, x0:x1] = paint_label
    return label, inst


def add_object(label: np.ndarray, inst: np.ndarray, obj_label: np.ndarray,
               obj_inst: np.ndarray, top_left: Tuple[int, int], obj_id: int
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Paste a copied object (its label/inst patch) at a clicked location."""
    y, x = top_left
    mask = obj_inst == obj_id
    ph, pw = obj_label.shape[:2]
    h, w = label.shape[:2]
    ph = min(ph, h - y)
    pw = min(pw, w - x)
    label = label.copy()
    inst = inst.copy()
    sub_mask = mask[:ph, :pw]
    label[y:y + ph, x:x + pw][sub_mask] = obj_label[:ph, :pw][sub_mask]
    inst[y:y + ph, x:x + pw][sub_mask] = obj_inst[:ph, :pw][sub_mask]
    return label, inst


def set_object_style(feat_map: np.ndarray, inst: np.ndarray, obj_id: int,
                     cluster_centers: np.ndarray, cluster_idx: int) -> np.ndarray:
    """Fill the object's region of the feature map with a sampled cluster
    center (per-object style switching, ``ui_model.py`` style sampling)."""
    feat = feat_map.copy()
    mask = inst == obj_id
    feat[mask] = cluster_centers[cluster_idx]
    return feat


class EditSession:
    """Holds current (label, inst, feat) maps and re-synthesizes via the
    pix2pixHD engine; tracks the edited region for composited updates."""

    def __init__(self, engine, g_params, label: np.ndarray,
                 inst: Optional[np.ndarray] = None,
                 feat: Optional[np.ndarray] = None):
        self.engine = engine
        self.g_params = g_params
        self.label = np.asarray(label)
        self.inst = (np.asarray(inst) if inst is not None
                     else np.zeros(self.label.shape[:2], np.int32))
        self.feat = feat
        self.current = self.synthesize()

    def synthesize(self) -> np.ndarray:
        label = jnp.asarray(self.label)[None]
        if label.ndim == 3:
            label = label[..., None]
        inst = jnp.asarray(self.inst)[None, ..., None]
        if self.feat is not None:
            # style-conditioned synthesis: set_object_style edits reach the
            # output through the feature channels (ui_model.py:230-298)
            feat = jnp.asarray(self.feat)[None]
            out = self.engine.infer_with_features(self.g_params, label, inst,
                                                  feat)
        else:
            out = self.engine.infer_step(self.g_params, label, inst)
        return np.asarray(out[0])

    def set_style(self, obj_id: int, cluster_centers: np.ndarray,
                  cluster_idx: int) -> np.ndarray:
        """Per-object style switch: paint the sampled cluster center over the
        object's feature-map region and re-synthesize (ui_model.py's style
        sampling). Requires the session to carry a feature map."""
        if self.feat is None:
            raise ValueError("EditSession has no feature map; construct with "
                             "feat= to enable style edits")
        self.feat = set_object_style(self.feat, self.inst, obj_id,
                                     cluster_centers, cluster_idx)
        self.current = self.synthesize()
        return self.current

    def apply(self, fn, *args, region: Optional[Tuple[int, int, int, int]] = None,
              **kw) -> np.ndarray:
        """Run an edit op, re-synthesize, and composite only the edited
        bounding box (dilated by the receptive-field margin) into the image."""
        result = fn(self.label, self.inst, *args, **kw)
        if isinstance(result, tuple):
            self.label, self.inst = result
        else:
            self.label = result
        new = self.synthesize()
        if region is None:
            self.current = new
        else:
            y0, x0, y1, x1 = region
            margin = 64  # receptive-field dilation
            h, w = new.shape[:2]
            y0, x0 = max(0, y0 - margin), max(0, x0 - margin)
            y1, x1 = min(h, y1 + margin), min(w, x1 + margin)
            self.current = self.current.copy()
            self.current[y0:y1, x0:x1] = new[y0:y1, x0:x1]
        return self.current
