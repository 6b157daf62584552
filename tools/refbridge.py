"""Run the PUBLIC reference code (/root/reference) on CPU for golden outputs.

This module is a test/verification harness only — it is NOT part of the
shipped framework and is never imported by ``cistar_tpu``. It provides:

  * a CPU monkeypatch (the reference hard-codes ``.cuda()`` moves, e.g.
    ``p2pHD/models/pix2pixHD_model.py:121``),
  * a minimal torchvision stub (torchvision is not installed in this
    container; the reference only uses a handful of transforms:
    ``IST/data/image_transform.py:8-31``, ``CycleGAN/test.py:115-121``),
  * npz serialization of torch state dicts + tensors so each reference
    sub-project can run in its own subprocess (their top-level module names
    collide: ``models``, ``util``, ...), with the framework-side test
    consuming plain arrays.

The goldens produced here drive ``tests/test_reference_parity.py`` and the
recorded full-size runs in ``docs/PARITY.md``.
"""

from __future__ import annotations

import sys
import types

REF = "/root/reference"


def patch_cuda_to_cpu():
    """Make the reference's unconditional .cuda() calls no-ops."""
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.is_available = lambda: False
    torch.cuda.FloatTensor = torch.FloatTensor
    torch.cuda.HalfTensor = torch.HalfTensor
    torch.cuda.LongTensor = torch.LongTensor


def install_torchvision_stub():
    """Provide the few torchvision.transforms the reference actually uses.

    Semantics match (old) torchvision for the exercised paths: ``Scale`` /
    ``Resize`` resize the SHORTER side to ``size`` with PIL bilinear;
    ``ToTensor`` maps PIL → float CHW in [0,1]; ``Normalize`` is
    channel-wise (x-mean)/std on tensors; ``Grayscale`` converts to L.
    """
    import numpy as np
    import torch
    from PIL import Image

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class Resize:
        def __init__(self, size, interpolation=Image.BILINEAR):
            self.size, self.interp = size, interpolation

        def __call__(self, img):
            if isinstance(self.size, int):
                w, h = img.size
                if w <= h:
                    nw, nh = self.size, int(round(h * self.size / w))
                else:
                    nh, nw = self.size, int(round(w * self.size / h))
            else:
                nh, nw = self.size
            return img.resize((nw, nh), self.interp)

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, dtype=np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[None]
            else:
                arr = arr.transpose(2, 0, 1)
            return torch.from_numpy(arr.copy())

    class ToPILImage:
        def __call__(self, t):
            arr = np.asarray(t.detach().clamp(0, 1).mul(255).byte())
            if arr.ndim == 3:
                arr = arr.transpose(1, 2, 0)
                if arr.shape[-1] == 1:
                    arr = arr[..., 0]
            return Image.fromarray(arr)

    class Normalize:
        def __init__(self, mean, std):
            self.mean, self.std = mean, std

        def __call__(self, t):
            mean = torch.as_tensor(self.mean, dtype=t.dtype)
            std = torch.as_tensor(self.std, dtype=t.dtype)
            if mean.ndim == 0:
                mean = mean[None]
            if std.ndim == 0:
                std = std[None]
            return (t - mean[:, None, None]) / std[:, None, None]

    class Lambda:
        def __init__(self, fn):
            self.fn = fn

        def __call__(self, x):
            return self.fn(x)

    class Grayscale:
        def __init__(self, num_output_channels=1):
            self.n = num_output_channels

        def __call__(self, img):
            g = img.convert("L")
            return g if self.n == 1 else Image.merge("RGB", [g] * 3)

    class RandomRotation:  # not used in golden paths; present for imports
        def __init__(self, *a, **k):
            raise NotImplementedError

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    mo = types.ModuleType("torchvision.models")
    fn = types.ModuleType("torchvision.transforms.functional")
    for cls in (Compose, Resize, ToTensor, ToPILImage, Normalize, Lambda,
                Grayscale, RandomRotation):
        setattr(tr, cls.__name__, cls)
    tr.Scale = Resize  # old-torchvision alias used by IST
    tr.functional = fn
    tv.transforms = tr
    tv.models = mo
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.transforms.functional"] = fn
    sys.modules["torchvision.models"] = mo


def install_yacs_stub():
    """Minimal ``yacs.config.CfgNode`` (yacs isn't installed): attribute
    dict with ``clone()`` — all ``IST/config/defaults.py`` needs."""
    import copy

    class CfgNode(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

        def clone(self):
            return copy.deepcopy(self)

        def freeze(self):
            pass

    yacs = types.ModuleType("yacs")
    cfgmod = types.ModuleType("yacs.config")
    cfgmod.CfgNode = CfgNode
    yacs.config = cfgmod
    sys.modules["yacs"] = yacs
    sys.modules["yacs.config"] = cfgmod


def save_golden(path, state_dicts=None, arrays=None):
    """Write ``{sd:<name>:<key>: w, io:<key>: arr}`` to one npz."""
    import numpy as np

    out = {}
    for name, sd in (state_dicts or {}).items():
        for k, v in sd.items():
            out[f"sd:{name}:{k}"] = np.asarray(v.detach().cpu().numpy()
                                               if hasattr(v, "detach") else v)
    for k, v in (arrays or {}).items():
        out[f"io:{k}"] = np.asarray(v.detach().cpu().numpy()
                                    if hasattr(v, "detach") else v)
    np.savez_compressed(path, **out)


def load_golden(path):
    """Inverse of :func:`save_golden` → (state_dicts, arrays)."""
    import numpy as np

    data = np.load(path)
    sds, arrays = {}, {}
    for k in data.files:
        if k.startswith("sd:"):
            _, name, key = k.split(":", 2)
            sds.setdefault(name, {})[key] = data[k]
        else:
            arrays[k.split(":", 1)[1]] = data[k]
    return sds, arrays


def synthetic_radar(size, seed=0):
    """Sparse-dot radar-like grayscale PIL image (like bench.py's generator)."""
    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(seed)
    img = np.zeros((size, size), np.float32)
    pts = rng.randint(0, size, size=(size * 2, 2))
    img[pts[:, 0], pts[:, 1]] = rng.rand(size * 2) * 255
    return Image.fromarray(img.astype(np.uint8))


def synthetic_lidar(size, seed=1):
    """Concentric-ring lidar-like grayscale PIL image."""
    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    r = np.hypot(yy - size / 2, xx - size / 2)
    img = (np.sin(r / 6.0) ** 8) * 200
    img += rng.rand(size, size) * 30
    return Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))
