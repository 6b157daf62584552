"""Feature clustering tools — parity with ``p2pHD/encode_features.py`` and
``p2pHD/precompute_feature_maps.py``.

``encode-features``: run the instance Encoder over a dataset, build a
per-label table of (feat_num + size) rows, KMeans-cluster each label's
features, save cluster centers as ``features_clustered_NNN.npy`` (dict of
label → (n_clusters, feat_num) arrays — the format ``sample_features``
consumes, ``pix2pixHD_model.py:230-249``).

``precompute-feature-maps``: save the per-image encoded (instance-pooled)
feature maps as ``.npy`` alongside the dataset for ``--load_features`` runs.

Usage:
  python -m cistar_tpu.apps.encode_features --mode cluster ...
  python -m cistar_tpu.apps.encode_features --mode maps ...
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["cluster", "maps"], default="cluster")
    p.add_argument("--dataroot", required=True)
    p.add_argument("--checkpoints_dir", default="./checkpoints")
    p.add_argument("--name", default="label2city")
    p.add_argument("--which_epoch", default="latest")
    p.add_argument("--label_nc", type=int, default=35)
    p.add_argument("--feat_num", type=int, default=3)
    p.add_argument("--nef", type=int, default=16)
    p.add_argument("--n_downsample_E", type=int, default=4)
    p.add_argument("--n_clusters", type=int, default=10)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--max_instances", type=int, default=64)
    p.add_argument("--platform", default="", choices=["", "cpu", "tpu", "axon"])
    args = p.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms",
                          "axon" if args.platform == "tpu" else args.platform)

    import jax
    import jax.numpy as jnp
    from sklearn.cluster import KMeans

    from cistar_tpu.core import checkpoint as ckpt
    from cistar_tpu.data.datasets import Loader, Radar2LidarDataset
    from cistar_tpu.models.pix2pixhd import Encoder

    encoder = Encoder(output_nc=args.feat_num, ngf=args.nef,
                      n_downsampling=args.n_downsample_E)
    x0 = jnp.zeros((1, args.size, args.size, 1), jnp.float32)
    inst0 = jnp.zeros((1, args.size, args.size), jnp.int32)
    params = encoder.init(jax.random.PRNGKey(0), x0, inst0)["params"]
    save_dir = os.path.join(args.checkpoints_dir, args.name)
    e_path = os.path.join(save_dir, f"{args.which_epoch}_net_E.npz")
    if os.path.exists(e_path):
        params = ckpt.load_network(save_dir, "E", args.which_epoch, params)
        print("loaded encoder from", e_path)
    else:
        print("WARNING: no trained encoder found at", e_path, "- random init")

    @jax.jit
    def encode(params, image, inst):
        return encoder.apply({"params": params}, image, inst,
                             max_instances=args.max_instances)

    dataset = Radar2LidarDataset(args.dataroot, size=args.size, mode="train",
                                 rotate=False)
    loader = Loader(dataset, 1)

    if args.mode == "maps":
        out_dir = os.path.join(args.dataroot, "feat")
        os.makedirs(out_dir, exist_ok=True)
        for batch in loader:
            image = jnp.asarray(batch["image"])
            inst = jnp.zeros(image.shape[:3], jnp.int32)
            feat = np.asarray(encode(params, image, inst))
            name = os.path.splitext(os.path.basename(batch["path"][0]))[0]
            np.save(os.path.join(out_dir, name + ".npy"), feat[0])
            print("saved feature map for", name)
        return

    # cluster mode: per-label feature table -> KMeans centers
    # (radar datasets have one implicit label 0; semantic datasets use inst ids)
    block_num = 32
    features = {i: np.zeros((0, args.feat_num + 1)) for i in range(max(1, args.label_nc))}
    for batch in loader:
        image = jnp.asarray(batch["image"])
        inst = jnp.zeros(image.shape[:3], jnp.int32)
        feat = np.asarray(encode(params, image, inst))[0]
        h, w = feat.shape[:2]
        # single-instance path: take the (constant) pooled feature + area share
        val = np.zeros((1, args.feat_num + 1))
        val[0, : args.feat_num] = feat[h // 2, w // 2, :]
        val[0, args.feat_num] = float(h * w) / (h * w // block_num)
        features[0] = np.append(features[0], val, axis=0)

    clustered = {}
    for label, table in features.items():
        if table.shape[0] < args.n_clusters:
            continue
        km = KMeans(n_clusters=args.n_clusters, n_init=10, random_state=0)
        km.fit(table[:, : args.feat_num])
        clustered[label] = km.cluster_centers_.astype(np.float32)
        print(f"label {label}: clustered {table.shape[0]} samples "
              f"-> {args.n_clusters} centers")
    out = os.path.join(save_dir, f"features_clustered_{args.n_clusters:03d}.npy")
    os.makedirs(save_dir, exist_ok=True)
    np.save(out, clustered, allow_pickle=True)
    print("saved", out)


if __name__ == "__main__":
    main()
