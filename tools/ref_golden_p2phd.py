"""Golden outputs from the ACTUAL reference pix2pixHD code (CPU subprocess).

Records seeded-init weights + forward outputs for every network family in
``p2pHD/models/networks.py``, and a model-level ``InferenceModel.inference``
flow driven by the shipped ``checkpoints/r2l_MSRB_7/opt.txt`` (including the
reference's own ``save_network``/``load_network`` round trip,
``p2pHD/models/base_model.py:42-88``).

Run:  python tools/ref_golden_p2phd.py --family unet --out /tmp/g.npz [--size 256]
Families: global unet local multiscale autoencoder encoder msd wd uda inference_r2l
"""

import argparse
import ast
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import refbridge  # noqa: E402

refbridge.install_torchvision_stub()
sys.path.insert(0, refbridge.REF + "/p2pHD")

import numpy as np  # noqa: E402
import torch  # noqa: E402

refbridge.patch_cuda_to_cpu()

from models import networks  # noqa: E402
from torchvision import transforms  # noqa: E402


def gray_input(size, seed=0, which="radar"):
    prep = transforms.Compose([transforms.Grayscale(), transforms.ToTensor(),
                               transforms.Normalize(0.5, 0.5)])
    img = (refbridge.synthetic_radar(size, seed) if which == "radar"
           else refbridge.synthetic_lidar(size, seed))
    return prep(img).unsqueeze(0)


def inst_map(size):
    """Blocky instance-ID map (4 regions) for the Encoder's instance pooling."""
    m = np.zeros((1, 1, size, size), np.float32)
    m[:, :, : size // 2, size // 2:] = 1
    m[:, :, size // 2:, : size // 2] = 2
    m[:, :, size // 2:, size // 2:] = 3
    return torch.from_numpy(m)


def opt_from_file(path, **overrides):
    ns = argparse.Namespace()
    with open(path) as f:
        for line in f:
            line = line.strip()
            if ":" not in line or line.startswith("-"):
                continue
            k, v = line.split(":", 1)
            v = v.strip()
            try:
                val = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                val = v
            setattr(ns, k.strip(), val)
    for k, v in overrides.items():
        setattr(ns, k, v)
    return ns


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--family", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--ngf", type=int, default=0,
                   help="override generator width (0 = as-shipped config)")
    args = p.parse_args(argv)

    torch.manual_seed(0)
    size = args.size
    x = gray_input(size, 0, "radar")
    sds, arrays = {}, {"x": x}

    fam = args.family
    if fam == "global":
        net = networks.define_G(1, 1, args.ngf or 64, "global",
                                n_downsample_global=3, n_blocks_global=9)
    elif fam == "unet":  # the shipped r2l_MSRB_7 generator (opt.txt:51,44,52)
        net = networks.define_G(1, 1, args.ngf or 64, "UNet", n_blocks_global=3)
    elif fam == "local":
        net = networks.define_G(1, 1, args.ngf or 32, "local", n_downsample_global=3,
                                n_blocks_global=9, n_local_enhancers=1,
                                n_blocks_local=3)
    elif fam == "multiscale":  # the shipped r2l generator (r2l/opt.txt:51)
        net = networks.define_G(1, 1, args.ngf or 64, "multiscale")
    elif fam == "autoencoder":
        net = networks.define_G(1, 1, args.ngf or 32, "autoencoder",
                                n_downsample_global=2, n_blocks_global=3)
    elif fam == "encoder":  # netE wiring: pix2pixHD_model.py:57-59
        net = networks.define_G(1, 3, 16, "encoder", n_downsample_global=4)
        inst = inst_map(size)
        arrays["inst"] = inst
        with torch.no_grad():
            arrays["y"] = net(x, inst)
    elif fam == "msd":
        net = networks.define_D(2, args.ngf or 64, 3, norm="instance", use_sigmoid=False,
                                num_D=2, getIntermFeat=True)
        xx = torch.cat([x, gray_input(size, 1, "lidar")], dim=1)
        arrays["x"] = xx
        with torch.no_grad():
            outs = net(xx)
            for i, scale in enumerate(outs):
                for j, feat in enumerate(scale):
                    arrays[f"y_{i}_{j}"] = feat
            arrays["num_D"] = np.array(len(outs))
    elif fam == "wd":
        torch.manual_seed(0)
        net = networks.wDiscriminator(1)           # udaModel.py:337
        net.apply(networks.weights_init)
        with torch.no_grad():
            arrays["y"] = net(x).reshape(1)
    elif fam == "uda":
        # R2LAE wiring (udaModel.py:395-404): shared encoder, two decoders,
        # domain feature classifier. NOTE the reference sets
        # ``op_nc = min(prev_nf*2, max_ch)`` AFTER the last downsample
        # (networks.py:818-820) — one doubling past the real output width —
        # so the decoder only matches when the encoder reaches ``max_ch``;
        # valid (trained) configs satisfy ngf·2^down_conv ≥ max_ch.
        torch.manual_seed(0)
        enc = networks.UDAEncoder(1, size, down_conv=4, ngf=16, resblock=2,
                                  max_ch=256)
        dec_r = networks.UDADecoder(enc.op_nc, 1, size, enc.op_size,
                                    down_conv=4, resblock=2, max_ch=256)
        dec_l = networks.UDADecoder(enc.op_nc, 1, size, enc.op_size,
                                    down_conv=4, resblock=2, max_ch=256)
        dom = networks.DomainFeatureDescriminator(enc.op_nc)
        # snapshot to numpy NOW: state_dict() aliases live tensors, and the
        # train-mode forwards below update BN running stats in place
        snap = lambda d: {k: v.detach().clone().numpy()  # noqa: E731
                          for k, v in d.items()}
        sds = {"enc": snap(enc.state_dict()), "dec_r": snap(dec_r.state_dict()),
               "dec_l": snap(dec_l.state_dict()), "dom": snap(dom.state_dict())}
        # eval mode: BatchNorm uses (fresh) running stats
        for m in (enc, dec_r, dec_l, dom):
            m.eval()
        with torch.no_grad():
            feat = enc(x)
            arrays["feat"] = feat
            arrays["rec_radar"] = dec_r(feat)
            arrays["rec_lidar"] = dec_l(feat)
            arrays["dom"] = dom(feat)
        # train mode: BatchNorm uses batch statistics (what training sees)
        for m in (enc, dec_r, dec_l, dom):
            m.train()
        with torch.no_grad():
            feat_t = enc(x)
            arrays["feat_train"] = feat_t
            arrays["rec_radar_train"] = dec_r(feat_t)
            arrays["dom_train"] = dom(feat_t)
        arrays["op_nc"] = np.array(enc.op_nc)
        arrays["op_size"] = np.array(int(enc.op_size))
        refbridge.save_golden(args.out, state_dicts=sds, arrays=arrays)
        print(f"golden written: {args.out}")
        return
    elif fam == "transfer":
        # TransferModel / R2LTransfer generator pair
        # (pix2pixHD_model.py:347-352, :640-649)
        torch.manual_seed(0)
        fe = networks.FeatureEncoder(1, ngf=16, n_downsampling=4, n_scale=3)
        tg = networks.TransferGenerator(fe.op_nc, 1, 3, ngf=16,
                                        n_upsampling=4)
        with torch.no_grad():
            feat = fe(x)
            y = tg(feat)
        # FeatureEncoder's bespoke numbered save format (networks.py:616-631)
        fe_sd = {}
        layer_cnt = 0
        for m in fe.branch:
            for k, v in m.state_dict().items():
                fe_sd[f"{layer_cnt}|{k}"] = v
            layer_cnt += 1
        for m in fe.down_conv:
            for k, v in m.state_dict().items():
                fe_sd[f"{layer_cnt}|{k}"] = v
            layer_cnt += 1
        sds = {"fe": fe_sd, "tg": tg.state_dict()}
        arrays["feat"] = feat
        arrays["y"] = y
        refbridge.save_golden(args.out, state_dicts=sds, arrays=arrays)
        print(f"golden written: {args.out} (y std {float(y.std()):.4f})")
        return
    elif fam == "inference_r2l":
        # Full InferenceModel flow with the shipped opt.txt, including the
        # reference's save/load round trip (base_model.py:42-88).
        from models.pix2pixHD_model import InferenceModel

        tmp = tempfile.mkdtemp()
        opt = opt_from_file(
            refbridge.REF + "/p2pHD/checkpoints/r2l_MSRB_7/opt.txt",
            isTrain=False, which_epoch="latest", verbose=False, gpu_ids=[],
            checkpoints_dir=tmp, use_encoded_image=False, onnx=None,
            engine=None, data_type=32)
        os.makedirs(os.path.join(tmp, opt.name), exist_ok=True)
        netG = networks.define_G(1, 1, opt.ngf, opt.netG,
                                 n_blocks_global=opt.n_blocks_global)
        torch.save(netG.state_dict(),
                   os.path.join(tmp, opt.name, "latest_net_G.pth"))
        model = InferenceModel()
        model.initialize(opt)
        with torch.no_grad():
            y = model.inference(x, None)
        sds["G"] = model.netG.state_dict()
        arrays["y"] = y
        refbridge.save_golden(args.out, state_dicts=sds, arrays=arrays)
        print(f"golden written: {args.out} (y std {float(y.std()):.4f})")
        return
    else:
        raise ValueError(fam)

    net.eval()
    if "y" not in arrays and fam not in ("msd",):
        with torch.no_grad():
            arrays["y"] = net(x)
    sds["net"] = net.state_dict()
    refbridge.save_golden(args.out, state_dicts=sds, arrays=arrays)
    y = arrays.get("y")
    extra = f" (y std {float(np.std(np.asarray(y))):.4f})" if y is not None else ""
    print(f"golden written: {args.out}{extra}")


if __name__ == "__main__":
    main()
