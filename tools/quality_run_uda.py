"""Driven quality runs for the extended/UDA trainers (VERDICT r3 #6).

Round 3 gave the three flagship workloads committed end-to-end quality runs;
the parity tail (R2LAE, R2LTransfer, R2LImageCritic — ``udaModel.py:385-617``,
``pix2pixHD_model.py:625-893``) had only step tests. This driver trains each
on the synthetic radar/lidar set for a short budget ON CHIP and commits the
evidence under ``docs/quality_run_uda/``:

  * ``ae/``        — R2LAE loss curves (CSV) + cross-decode strips
                     (radar→lidar-decoder / lidar→radar-decoder / recon)
  * ``critic/``    — R2LImageCritic per-step w-distance trace (CSV)
  * ``transfer/``  — TransferP2P pretraining (radar & lidar AE pairs) then
                     R2LTransfer feature alignment: loss curves + strips

Run: python tools/quality_run_uda.py --dataroot .tmp/r2l_synth \
        [--size 256] [--epochs 10] [--out docs/quality_run_uda]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _save_strip(path, panels):
    """Stitch {name: (H,W) or (H,W,1) arrays in [-1,1]} horizontally."""
    import numpy as np
    from PIL import Image, ImageDraw

    tiles = []
    for name, arr in panels:
        a = np.asarray(arr, np.float32)
        if a.ndim == 3:
            a = a[..., 0]
        a = np.clip((a + 1.0) / 2.0, 0, 1)
        img = Image.fromarray((a * 255).astype("uint8")).convert("RGB")
        ImageDraw.Draw(img).text((4, 4), name, fill=(255, 64, 64))
        tiles.append(img)
    w = sum(t.width for t in tiles)
    h = max(t.height for t in tiles)
    out = Image.new("RGB", (w, h))
    x = 0
    for t in tiles:
        out.paste(t, (x, 0))
        x += t.width
    out.save(path)


def _write_csv(path, rows):
    if not rows:
        return
    keys = sorted(rows[0])
    with open(path, "w", newline="") as f:
        wtr = csv.DictWriter(f, fieldnames=keys)
        wtr.writeheader()
        wtr.writerows(rows)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", default=".tmp/r2l_synth")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--pre_epochs", type=int, default=4,
                    help="TransferP2P AE pretraining epochs per domain")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--out", default="docs/quality_run_uda")
    ap.add_argument("--phases", default="ae,critic,transfer",
                    help="comma subset of ae,critic,transfer")
    args = ap.parse_args(argv)
    phases = set(args.phases.split(","))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cistar_tpu.core.cache import enable_compilation_cache
    from cistar_tpu.data.datasets import Loader, UDADataset
    from cistar_tpu.engines.extended import (R2LAE, R2LImageCritic,
                                             R2LTransfer, make_transfer_p2p)

    enable_compilation_cache()
    os.makedirs(args.out, exist_ok=True)
    t_all = time.time()
    summary = {"dataroot": args.dataroot, "size": args.size,
               "epochs": args.epochs, "batch": args.batch,
               "device": str(jax.devices()[0])}

    dataset = UDADataset(args.dataroot, size=args.size, mode="train")
    test_set = UDADataset(args.dataroot, size=args.size, mode="test")
    loader = Loader(dataset, args.batch, shuffle=False)
    print(f"UDA train/test split: {len(dataset)}/{len(test_set)} pairs",
          flush=True)
    tb = test_set[0]
    test_radar = jnp.asarray(tb["radar"][None])
    test_lidar = jnp.asarray(tb["lidar"][None])

    # ---- 1. R2LAE (shared encoder, two decoders, domain classifier) -------
    if "ae" in phases:
        d = os.path.join(args.out, "ae")
        os.makedirs(d, exist_ok=True)
        eng = R2LAE(size=args.size, n_downsample=3, ngf=16,
                    compute_dtype=jnp.bfloat16)
        state = eng.init_state(jax.random.PRNGKey(0), size=args.size)
        rows = []
        t0 = time.time()
        for epoch in range(args.epochs):
            ep = {}
            for batch in loader:
                state, m, _ = eng.train_step(state,
                                             jnp.asarray(batch["radar"]),
                                             jnp.asarray(batch["lidar"]))
                for k, v in m.items():
                    ep.setdefault(k, []).append(float(v))
            rows.append({"epoch": epoch,
                         **{k: round(float(np.mean(v)), 5)
                            for k, v in ep.items()}})
            print(f"[ae] epoch {epoch}: " + ", ".join(
                f"{k}={rows[-1][k]:.4f}" for k in sorted(ep)), flush=True)
        _write_csv(os.path.join(d, "loss_log.csv"), rows)
        # R2LAE.infer returns the same-domain RECONSTRUCTIONS; the UDA
        # cross-decodes swap decoders on the shared-encoder features
        outs = eng.infer(state, test_radar, test_lidar)

        @jax.jit
        def cross_decode(st, radar, lidar):
            bs = radar.shape[0]
            ip = jnp.concatenate([radar, lidar], axis=0)
            feat = eng.E.apply(
                {"params": st.e, "batch_stats": st.stats["e"]},
                ip.astype(eng.cdt), train=False).astype(jnp.float32)
            r2l = eng.G_lidar.apply(
                {"params": st.g_lidar, "batch_stats": st.stats["g_lidar"]},
                feat[:bs].astype(eng.cdt), train=False)
            l2r = eng.G_radar.apply(
                {"params": st.g_radar, "batch_stats": st.stats["g_radar"]},
                feat[bs:].astype(eng.cdt), train=False)
            return r2l, l2r

        r2l, l2r = cross_decode(state, test_radar, test_lidar)
        _save_strip(os.path.join(d, "cross_decode.png"),
                    [("real_radar", np.asarray(test_radar[0])),
                     ("recon radar->radarG", np.asarray(outs["radar_gen"][0])),
                     ("cross radar->lidarG", np.asarray(r2l[0])),
                     ("real_lidar", np.asarray(test_lidar[0])),
                     ("recon lidar->lidarG", np.asarray(outs["lidar_gen"][0])),
                     ("cross lidar->radarG", np.asarray(l2r[0]))])
        summary["ae"] = {"epochs": args.epochs, "final": rows[-1],
                         "wall_s": round(time.time() - t0, 1)}

    # ---- 2. R2LImageCritic (Wasserstein distance meter) -------------------
    if "critic" in phases:
        d = os.path.join(args.out, "critic")
        os.makedirs(d, exist_ok=True)
        critic = R2LImageCritic(compute_dtype=jnp.float32)
        cstate = critic.init_state(jax.random.PRNGKey(1), size=args.size)
        crows = []
        t0 = time.time()
        step = 0
        for epoch in range(args.epochs):
            for batch in loader:
                cstate, m = critic.train_step(cstate,
                                              jnp.asarray(batch["lidar"]),
                                              jnp.asarray(batch["radar"]))
                crows.append({"step": step,
                              **{k: round(float(v), 5)
                                 for k, v in m.items()}})
                step += 1
            print(f"[critic] epoch {epoch}: w_distance="
                  f"{crows[-1]['w_distance']:.4f} (lidar_F-radar_F="
                  f"{crows[-1]['lidar_F'] - crows[-1]['radar_F']:.4f})",
                  flush=True)
        _write_csv(os.path.join(d, "w_distance.csv"), crows)
        summary["critic"] = {"steps": step, "final": crows[-1],
                             "wall_s": round(time.time() - t0, 1)}

    if "transfer" not in phases:
        summary["total_wall_s"] = round(time.time() - t_all, 1)
        _merge_summary(args.out, summary)
        print(json.dumps(summary, indent=1), flush=True)
        return

    # ---- 3. TransferP2P pretraining + R2LTransfer alignment ---------------
    d = os.path.join(args.out, "transfer")
    os.makedirs(d, exist_ok=True)
    t0 = time.time()

    def pretrain_pair(domain_in, domain_out, seed):
        """Short TransferP2P (FeatureEncoder+TransferGenerator under the full
        pix2pixHD objective) run: the pretrained nets R2LTransfer freezes."""
        peng = make_transfer_p2p(
            output_nc=1, ngf=32, n_downsampling=4, n_scale=3, n_blocks=3,
            input_nc=1, label_nc=0, no_instance=True, r2l=True,
            image_size=args.size, compute_dtype=jnp.bfloat16)
        pstate = peng.init_state(jax.random.PRNGKey(seed),
                                 image_size=args.size)
        prow = []
        for epoch in range(args.pre_epochs):
            ep = {}
            for batch in loader:
                pstate, m, _ = peng.train_step(
                    pstate, jnp.asarray(batch[domain_in]), None,
                    jnp.asarray(batch[domain_out]))
                for k, v in m.items():
                    ep.setdefault(k, []).append(float(v))
            prow.append({"epoch": epoch,
                         **{k: round(float(np.mean(v)), 5)
                            for k, v in ep.items()}})
            print(f"[pretrain {domain_in}] epoch {epoch}: "
                  f"loss_G={prow[-1].get('loss_G', 0):.4f} "
                  f"loss_D={prow[-1].get('loss_D', 0):.4f}", flush=True)
        return pstate, prow

    # radar AE pair: radar -> radar reconstruction; lidar pair: lidar -> lidar
    rstate, rrows = pretrain_pair("radar", "radar", 2)
    lstate, lrows = pretrain_pair("lidar", "lidar", 3)
    _write_csv(os.path.join(d, "pretrain_radar.csv"), rrows)
    _write_csv(os.path.join(d, "pretrain_lidar.csv"), lrows)

    # feature map is size/2^4; the critic needs 2^df_layers ≤ that (the
    # reference's 5 layers assume 512² → 32² features)
    df_layers = min(5, int(np.log2(max(2, args.size // 16))))
    teng = R2LTransfer(ngf=32, n_downsampling=4, n_scale=3, n_blocks=3,
                       df_layers=df_layers,
                       image_size=args.size, compute_dtype=jnp.bfloat16)
    frozen = teng.frozen_from_checkpoints(
        jax.random.PRNGKey(4),
        radar_e=rstate.g["E"], radar_g=rstate.g["G"],
        lidar_g=lstate.g["G"], net_dr=rstate.d, net_dl=lstate.d,
        size=args.size)
    tstate = teng.init_state(jax.random.PRNGKey(5), size=args.size)
    # warm-start the trainable lidar encoder from the lidar pair's encoder
    tstate = tstate._replace(lidar_e=jax.tree.map(jnp.asarray,
                                                  lstate.g["E"]))
    trows = []
    for epoch in range(args.epochs):
        ep = {}
        for batch in loader:
            tstate, m, fakes = teng.train_step(
                tstate, frozen, jnp.asarray(batch["radar"]),
                jnp.asarray(batch["lidar"]))
            for k, v in m.items():
                ep.setdefault(k, []).append(float(v))
        trows.append({"epoch": epoch,
                      **{k: round(float(np.mean(v)), 5)
                         for k, v in ep.items()}})
        print(f"[r2ltransfer] epoch {epoch}: " + ", ".join(
            f"{k}={trows[-1][k]:.4f}" for k in sorted(ep)), flush=True)
    _write_csv(os.path.join(d, "loss_log.csv"), trows)
    # cross-decode strip: radar->radarE->lidarG (the aligned translation),
    # lidar->lidarE->radarG (mirrors train_step's inspection decodes)
    @jax.jit
    def cross(frozen, lidar_e, radar, lidar):
        rf = teng.E.apply({"params": frozen["radar_e"]},
                          radar.astype(teng.cdt))
        lf = teng.E.apply({"params": lidar_e}, lidar.astype(teng.cdt))
        return (teng.G.apply({"params": frozen["lidar_g"]}, rf),
                teng.G.apply({"params": frozen["radar_g"]}, lf))

    radar_trans, lidar_trans = cross(frozen, tstate.lidar_e,
                                     test_radar, test_lidar)
    _save_strip(os.path.join(d, "cross_decode.png"),
                [("real_radar", np.asarray(test_radar[0])),
                 ("radar->lidarG", np.asarray(radar_trans[0])),
                 ("real_lidar", np.asarray(test_lidar[0])),
                 ("lidar->radarG", np.asarray(lidar_trans[0]))])
    summary["transfer"] = {"pre_epochs": args.pre_epochs,
                           "epochs": args.epochs,
                           "pretrain_radar_final": rrows[-1],
                           "pretrain_lidar_final": lrows[-1],
                           "final": trows[-1],
                           "wall_s": round(time.time() - t0, 1)}

    summary["total_wall_s"] = round(time.time() - t_all, 1)
    _merge_summary(args.out, summary)
    print(json.dumps(summary, indent=1), flush=True)


def _merge_summary(out_dir, summary):
    """Phase-split runs merge into one summary.json."""
    path = os.path.join(out_dir, "summary.json")
    merged = {}
    if os.path.exists(path):
        try:
            merged = json.load(open(path))
        except Exception:
            merged = {}
    merged.update(summary)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)


if __name__ == "__main__":
    main()
