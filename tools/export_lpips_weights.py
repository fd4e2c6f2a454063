"""Export trained LPIPS-VGG weights to the npz layout eval/metrics.py
loads (reference lpipsPyTorch/modules/lpips.py + networks.py ship
pretrained VGG16 features and linear calibration heads).

This environment has no network egress and no torchvision weights, so
the trained LPIPS cannot be shipped in-repo.  Run this script ONCE on
any machine that has them, then point `--lpips_weights` (or the
D2DGS_LPIPS_WEIGHTS env var) at the produced npz — eval output is
labeled `lpips_vgg` only when these real weights load; the random-VGG
substitute is always reported separately as `lpips_rand`.

Sources, tried in order:
  1. the `lpips` pip package (exact reference weights):
       python tools/export_lpips_weights.py --out lpips_vgg.npz
  2. a torch checkpoint you provide (state_dict of lpips.LPIPS or of
     torchvision vgg16 + lpips linear heads):
       python tools/export_lpips_weights.py --ckpt path.pth --out ...

npz layout (eval/metrics.py Lpips.__init__):
  conv{i}_w [O,I,3,3], conv{i}_b [O]  for i in 0..12  (13 VGG16 convs)
  lin{j}_w  [C]                       for j in 0..4   (squeezed 1x1 convs)
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def _from_lpips_package():
    import lpips as lpips_pkg   # pip install lpips (needs torchvision)
    import torch
    with torch.no_grad():
        model = lpips_pkg.LPIPS(net="vgg", verbose=False)
    out = {}
    convs = [m for m in model.net.slice1] + [m for m in model.net.slice2] \
        + [m for m in model.net.slice3] + [m for m in model.net.slice4] \
        + [m for m in model.net.slice5]
    i = 0
    for m in convs:
        if m.__class__.__name__ == "Conv2d":
            out[f"conv{i}_w"] = m.weight.detach().cpu().numpy()
            out[f"conv{i}_b"] = m.bias.detach().cpu().numpy()
            i += 1
    assert i == 13, f"expected 13 VGG convs, got {i}"
    for j, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().cpu().numpy()   # [1,C,1,1]
        out[f"lin{j}_w"] = w.reshape(-1)
    assert j == 4
    return out


def _from_checkpoint(path: str):
    import torch
    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v for k, v in sd.items() if hasattr(v, "numpy")}
    # accept either lpips.LPIPS state_dict naming or raw vgg 'features.N'
    conv_keys = sorted(
        [k for k in sd if k.endswith(".weight") and sd[k].dim() == 4
         and sd[k].shape[-1] == 3],
        key=lambda k: [int(t) for t in k.split(".") if t.isdigit()])
    out = {}
    n = 0
    for k in conv_keys:
        if n >= 13:
            break
        out[f"conv{n}_w"] = sd[k].numpy()
        out[f"conv{n}_b"] = sd[k[:-len("weight")] + "bias"].numpy()
        n += 1
    if n != 13:
        raise SystemExit(f"found only {n}/13 3x3 conv layers in {path}")
    lin_keys = sorted([k for k in sd if sd[k].dim() == 4
                       and sd[k].shape[-1] == 1 and sd[k].shape[0] == 1],
                      key=lambda k: [int(t) for t in k.split(".")
                                     if t.isdigit()])
    if len(lin_keys) != 5:
        raise SystemExit(f"found {len(lin_keys)}/5 LPIPS linear heads "
                         f"(1x1 convs) in {path}")
    for j, k in enumerate(lin_keys):
        out[f"lin{j}_w"] = sd[k].numpy().reshape(-1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_vgg.npz")
    ap.add_argument("--ckpt", default=None,
                    help="torch checkpoint to convert (otherwise the "
                         "lpips pip package is used)")
    args = ap.parse_args()
    if args.ckpt:
        weights = _from_checkpoint(args.ckpt)
    else:
        try:
            weights = _from_lpips_package()
        except ImportError as e:
            print(f"lpips package unavailable ({e}); pass --ckpt instead",
                  file=sys.stderr)
            return 1
    np.savez(args.out, **weights)
    taps = [weights[f"lin{j}_w"].shape[0] for j in range(5)]
    print(f"wrote {args.out}: 13 convs, lin taps {taps}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
