"""Fidelity curves for a trained r2l pix2pixHD experiment.

For every saved epoch checkpoint (``{epoch}_net_G.npz``) run the generator
over the held-out test split and record correlation / L1 / PSNR of the fake
lidar against the ground-truth lidar, written as ``fidelity.csv`` in the
experiment dir. This is the measurement the reference leaves to visual
inspection of the training web gallery (``p2pHD/train.py`` + visualizer);
here it is a recorded curve so convergence of the shipped ``r2l_MSRB_7``
recipe is checkable.

Usage:
  python tools/eval_r2l_fidelity.py --name r2l_q --checkpoints_dir /tmp/ck \
      --dataroot /tmp/r2l_data --load_opt checkpoints/r2l_MSRB_7/opt.txt
"""

from __future__ import annotations

import csv
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from cistar_tpu.apps.p2phd_options import TestOptions

    opt = TestOptions().parse(argv, save=False)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.core import checkpoint as ckpt
    from cistar_tpu.data.datasets import Loader, Radar2LidarDataset
    from cistar_tpu.engines.p2phd import Pix2PixHD

    size = opt.r2l_res if opt.r2l else opt.fineSize
    engine = Pix2PixHD(
        net_g=opt.netG, input_nc=opt.input_nc, output_nc=opt.output_nc,
        label_nc=opt.label_nc, ngf=opt.ngf,
        n_downsample_global=opt.n_downsample_global,
        n_blocks_global=opt.n_blocks_global,
        n_local_enhancers=opt.n_local_enhancers,
        n_blocks_local=opt.n_blocks_local, norm=opt.norm,
        no_instance=opt.no_instance, r2l=opt.r2l, image_size=size,
        compute_dtype=jnp.bfloat16 if (opt.fp16 or opt.data_type == 16)
        else jnp.float32,
    )
    state = engine.init_state(jax.random.PRNGKey(0), image_size=size)
    save_dir = os.path.join(opt.checkpoints_dir, opt.name)

    import itertools

    dataset = Radar2LidarDataset(opt.dataroot, size=size, mode="test")
    batches = list(itertools.islice(Loader(dataset, 1), opt.how_many))
    print(f"eval split: {len(batches)} images @ {size}²")

    infer = engine.infer_step  # already jitted (static self)

    epochs = []
    for path in glob.glob(os.path.join(save_dir, "*_net_G.npz")):
        m = re.match(r"(\d+)_net_G\.npz", os.path.basename(path))
        if m:
            epochs.append(int(m.group(1)))
    epochs.sort()
    if os.path.exists(os.path.join(save_dir, "latest_net_G.npz")):
        epochs.append("latest")
    if not epochs:
        raise SystemExit(f"no *_net_G.npz checkpoints under {save_dir}")

    rows = []
    for ep in epochs:
        g = ckpt.load_network(save_dir, "G", ep, state.g)
        corrs, l1s, mses = [], [], []
        for b in batches:
            fake = np.asarray(infer(g, jnp.asarray(b["label"])),
                              np.float32)[0]
            real = np.asarray(b["image"], np.float32)[0]
            corrs.append(np.corrcoef(fake.ravel(), real.ravel())[0, 1])
            l1s.append(np.abs(fake - real).mean())
            mses.append(((fake - real) ** 2).mean())
        psnr = 10 * np.log10(4.0 / np.mean(mses))  # range [-1,1] → peak 2
        rows.append({"epoch": ep, "corr": float(np.mean(corrs)),
                     "l1": float(np.mean(l1s)), "psnr": float(psnr)})
        print(f"epoch {ep:>6}: corr {rows[-1]['corr']:.4f} "
              f"l1 {rows[-1]['l1']:.4f} psnr {rows[-1]['psnr']:.2f} dB")

    out_csv = os.path.join(save_dir, "fidelity.csv")
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["epoch", "corr", "l1", "psnr"])
        w.writeheader()
        w.writerows(rows)
    print("wrote", out_csv)


if __name__ == "__main__":
    main()
