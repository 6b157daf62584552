"""Host-side datasets matching the reference's layouts and split policies.

All datasets yield NHWC float32 numpy arrays (batch dicts) ready for
``jax.device_put`` — no torch dependency. Parity targets:

  * :class:`CycleGANImageDataset` ↔ ``CycleGAN/datasets.py:10-63`` — paired
    ``{root}/radar/*.png`` + ``{root}/lidar/*.png`` dirs; train = first 50%,
    test = last 10%; unaligned random B sampling; shared random rotation ±45°
    in train; Grayscale → ToTensor → Normalize(0.5, 0.5).
  * :class:`Radar2LidarDataset` ↔ ``p2pHD/data/aligned_dataset.py`` (r2l
    branch) — paired radar/lidar PNG or NPY, resize to 512², shared random
    rotation 0–360°, Normalize(0.5, 0.5), 70/30 split.
  * :class:`UDADataset` ↔ aligned_dataset.py UDA branch — timestamp-driven,
    30% train split.

The loader (:class:`Loader`) does deterministic epoch shuffling + batching +
optional drop-partial, with a background prefetch thread for host/device
overlap.
"""

from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from cistar_tpu.data import transforms as T


def _list_pngs(d: str) -> List[str]:
    return sorted(glob.glob(os.path.join(d, "*.png")))


class CycleGANImageDataset:
    """Unpaired radar/lidar dataset with the reference's exact split policy."""

    def __init__(self, root: str, size: Optional[int] = None, unaligned: bool = False,
                 mode: str = "train", grayscale: bool = True, seed: int = 0,
                 cache: bool = True):
        self.files_a = _list_pngs(os.path.join(root, "radar"))
        self.files_b = _list_pngs(os.path.join(root, "lidar"))
        split = int(len(self.files_a) * 0.5)
        test = int(len(self.files_a) * 0.9)
        if mode == "train":
            self.files_a = self.files_a[:split]
            self.files_b = self.files_b[:split]
        else:
            self.files_a = self.files_a[test:]
            self.files_b = self.files_b[test:]
        self.unaligned = unaligned
        self.mode = mode
        self.size = size
        self.grayscale = grayscale
        self.rng = np.random.RandomState(seed)
        # Decoded-image memo (see Radar2LidarDataset): downstream rotate/
        # normalize always allocate fresh arrays, so sharing is safe.
        self._cache: Dict[str, np.ndarray] = {} if cache else None
        self._cache_bytes = 0
        self._cache_budget = 1 << 30  # 1 GiB across both streams

    def __len__(self) -> int:
        return max(len(self.files_a), len(self.files_b))

    def _load(self, path: str) -> np.ndarray:
        if self._cache is not None:
            hit = self._cache.get(path)
            if hit is None:
                hit = self._load_uncached(path)
                if self._cache_bytes + hit.nbytes <= self._cache_budget:
                    self._cache[path] = hit
                    self._cache_bytes += hit.nbytes
            return hit
        return self._load_uncached(path)

    def _load_uncached(self, path: str) -> np.ndarray:
        img = T.load_image(path, mode="L" if self.grayscale else "RGB")
        if self.size is not None and img.size != (self.size, self.size):
            img = img.resize((self.size, self.size))
        return T.pil_to_array(img)  # HWC [0,1]

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        item_a = self._load(self.files_a[index % len(self.files_a)])
        name_a = os.path.basename(self.files_a[index % len(self.files_a)])
        if self.unaligned:
            j = self.rng.randint(0, len(self.files_b))
        else:
            j = index % len(self.files_b)
        item_b = self._load(self.files_b[j])
        if self.mode == "train":
            angle = self.rng.randint(-45, 46)  # shared rotation, both frames
            item_a = T.rotate_image(item_a, angle)
            item_b = T.rotate_image(item_b, angle)
        item_a = T.normalize(item_a)
        item_b = T.normalize(item_b)
        return {"A": item_a.astype(np.float32), "B": item_b.astype(np.float32),
                "name": name_a}


class Radar2LidarDataset:
    """p2pHD ``Radar2LidarDataset``: paired radar (label) → lidar (image).

    PNG or NPY inputs, resized to ``size``² ; shared random rotation 0–360° in
    train; Normalize(0.5, 0.5); 70/30 train/test split
    (``p2pHD/data/aligned_dataset.py`` r2l path).
    """

    def __init__(self, root: str, size: int = 512, mode: str = "train",
                 phase_split: float = 0.7, seed: int = 0, rotate: bool = True,
                 cache: bool = True):
        self.radar = _list_pngs(os.path.join(root, "radar")) or sorted(
            glob.glob(os.path.join(root, "radar", "*.npy")))
        self.lidar = _list_pngs(os.path.join(root, "lidar")) or sorted(
            glob.glob(os.path.join(root, "lidar", "*.npy")))
        split = int(len(self.radar) * phase_split)
        if mode == "train":
            self.radar, self.lidar = self.radar[:split], self.lidar[:split]
        else:
            self.radar, self.lidar = self.radar[split:], self.lidar[split:]
        self.size, self.mode, self.rotate = size, mode, rotate
        self.rng = np.random.RandomState(seed)
        # Decoded-image memo: these radar sweeps are small grayscale frames
        # (512² fp32 ≈ 1 MB each), so keeping the decoded+resized array per
        # path turns the steady-state epoch host cost into augmentation only.
        # Capped so a large real dataset degrades to plain decode instead of
        # growing host RSS without bound.
        self._cache: Dict[str, np.ndarray] = {} if cache else None
        self._cache_bytes = 0
        self._cache_budget = 1 << 30  # 1 GiB across both streams

    def __len__(self) -> int:
        return len(self.radar)

    def _load(self, path: str) -> np.ndarray:
        if self._cache is not None:
            hit = self._cache.get(path)
            if hit is None:
                hit = self._load_uncached(path)
                if self._cache_bytes + hit.nbytes <= self._cache_budget:
                    self._cache[path] = hit
                    self._cache_bytes += hit.nbytes
            return hit
        return self._load_uncached(path)

    def _load_uncached(self, path: str) -> np.ndarray:
        if path.endswith(".npy"):
            arr = np.load(path).astype(np.float32)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            if arr.max() > 1.5:
                arr = arr / 255.0
        else:
            arr = T.pil_to_array(T.load_image(path, mode="L"))
        if arr.shape[0] != self.size or arr.shape[1] != self.size:
            img = T.array_to_pil(arr)
            arr = T.pil_to_array(img.resize((self.size, self.size)))
        return arr

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        radar = self._load(self.radar[index])
        lidar = self._load(self.lidar[index])
        if self.mode == "train" and self.rotate:
            angle = self.rng.randint(0, 360)
            radar = T.rotate_image(radar, angle)
            lidar = T.rotate_image(lidar, angle)
        return {
            "label": T.normalize(radar).astype(np.float32),
            "image": T.normalize(lidar).astype(np.float32),
            "inst": np.zeros((1,), np.float32),
            "feat": np.zeros((1,), np.float32),
            "path": self.radar[index],
        }


class UDADataset:
    """p2pHD ``UDADataset``: timestamp.txt-driven radar/lidar pairs, 30% train."""

    def __init__(self, root: str, size: int = 512, mode: str = "train",
                 train_frac: float = 0.3, seed: int = 0):
        ts_file = os.path.join(root, "timestamp.txt")
        if os.path.exists(ts_file):
            with open(ts_file) as f:
                stamps = [l.strip() for l in f if l.strip()]
            self.radar = [os.path.join(root, "radar", s + ".png") for s in stamps]
            self.lidar = [os.path.join(root, "lidar", s + ".png") for s in stamps]
        else:
            self.radar = _list_pngs(os.path.join(root, "radar"))
            self.lidar = _list_pngs(os.path.join(root, "lidar"))
        split = int(len(self.radar) * train_frac)
        if mode == "train":
            self.radar, self.lidar = self.radar[:split], self.lidar[:split]
        else:
            self.radar, self.lidar = self.radar[split:], self.lidar[split:]
        self.size = size
        self.rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return len(self.radar)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        def load(p):
            arr = T.pil_to_array(T.load_image(p, mode="L"))
            if arr.shape[0] != self.size:
                arr = T.pil_to_array(T.array_to_pil(arr).resize((self.size, self.size)))
            return T.normalize(arr).astype(np.float32)

        return {"radar": load(self.radar[index]), "lidar": load(self.lidar[index]),
                "path": self.radar[index]}


class NativeCycleGANDataset:
    """CycleGAN dataset backed by the native C++ loader (libpng decode +
    resize + normalize in a thread pool — ``native/dataloader.cpp``).

    Same split policy and pairing semantics as :class:`CycleGANImageDataset`;
    train-mode rotation falls back to numpy (rotation is cheap relative to
    decode). Construct via :func:`make_cyclegan_dataset` which picks native
    when the extension builds.
    """

    def __init__(self, root: str, size: int, unaligned: bool = False,
                 mode: str = "train", seed: int = 0, n_threads: int = 8):
        from cistar_tpu.data.native_loader import NativePngLoader

        files_a = _list_pngs(os.path.join(root, "radar"))
        files_b = _list_pngs(os.path.join(root, "lidar"))
        split = int(len(files_a) * 0.5)
        test = int(len(files_a) * 0.9)
        if mode == "train":
            files_a, files_b = files_a[:split], files_b[:split]
        else:
            files_a, files_b = files_a[test:], files_b[test:]
        self.loader_a = NativePngLoader(files_a, size, channels=1,
                                        n_threads=n_threads)
        self.loader_b = NativePngLoader(files_b, size, channels=1,
                                        n_threads=n_threads)
        self.files_a = files_a
        self.unaligned = unaligned
        self.mode = mode
        self.rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return max(len(self.loader_a), len(self.loader_b))

    def get_batch(self, indices) -> Dict[str, np.ndarray]:
        ia = [i % len(self.loader_a) for i in indices]
        if self.unaligned:
            ib = list(self.rng.randint(0, len(self.loader_b), len(indices)))
        else:
            ib = [i % len(self.loader_b) for i in indices]
        a = self.loader_a.get_batch(ia)
        b = self.loader_b.get_batch(ib)
        if self.mode == "train":
            for j in range(a.shape[0]):
                angle = self.rng.randint(-45, 46)
                a[j] = T.rotate_image(a[j], angle)
                b[j] = T.rotate_image(b[j], angle)
        names = [os.path.basename(self.files_a[i]) for i in ia]
        return {"A": a, "B": b, "name": names}


def make_cyclegan_dataset(root: str, size: Optional[int], unaligned: bool,
                          mode: str, prefer_native: bool = True):
    """Native loader when the C++ extension builds; PIL fallback otherwise."""
    if prefer_native and size is not None:
        try:
            return NativeCycleGANDataset(root, size, unaligned, mode)
        except Exception:
            pass
    return CycleGANImageDataset(root, size=size, unaligned=unaligned, mode=mode)


class Loader:
    """Batching iterator with deterministic shuffling and background prefetch.

    The TPU-friendly replacement for torch ``DataLoader(num_workers=N)``
    (``CycleGAN/train.py:160-161``, ``p2pHD/data/custom_dataset_data_loader.py``):
    a host thread assembles NHWC batches ahead of the device, so the jitted
    step never waits on PNG decode. Datasets exposing ``get_batch(indices)``
    (the native C++ loader) skip Python per-item collation entirely.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0, prefetch: int = 2,
                 device_put: bool = False, mesh=None):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0
        # Double-buffered host→device transfer: when enabled, the prefetch
        # thread also issues the (async) device_put so the jitted step never
        # waits on the PCIe/tunnel copy.
        self.device_put = device_put
        self.mesh = mesh

    def __len__(self) -> int:
        n = len(self.ds)
        return n // self.bs if self.drop_last else (n + self.bs - 1) // self.bs

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.ds))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(idx)
        return idx

    def _collate(self, items: Sequence[Dict]) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        for key in items[0]:
            vals = [it[key] for it in items]
            if isinstance(vals[0], str):
                out[key] = vals  # type: ignore[assignment]
            else:
                out[key] = np.stack(vals, axis=0)
        return out

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._indices()
        batches = [idx[i:i + self.bs] for i in range(0, len(idx), self.bs)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.bs]
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        has_batch_api = hasattr(self.ds, "get_batch")

        def to_device(batch):
            if not self.device_put:
                return batch
            import jax

            from cistar_tpu.parallel.sharding import shard_batch

            arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
            if self.mesh is not None:
                arrays = shard_batch(arrays, self.mesh)
            else:
                arrays = jax.device_put(arrays)
            out = dict(batch)
            out.update(arrays)
            return out

        def worker():
            # An exception in __getitem__/decode must reach the consumer —
            # swallowing it would silently truncate the epoch (round-1 bug).
            try:
                for b in batches:
                    if has_batch_api:
                        q.put(to_device(self.ds.get_batch([int(i) for i in b])))
                    else:
                        q.put(to_device(self._collate([self.ds[int(i)] for i in b])))
            except BaseException as exc:  # noqa: BLE001 — re-raised in consumer
                q.put(("error", exc))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, tuple) and len(item) == 2 and item[0] == "error":
                raise item[1]
            yield item
        self.epoch += 1
