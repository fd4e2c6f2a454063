"""RAFT optical-flow supervision data (reference scene/__init__.py:82-87
+ train_gui.py:318-332).

The reference looks for `raft_neighbouring/<image_name>.*.npy` flow
fields (pixel displacements toward a neighbouring frame, file name
encodes the target frame) with companion `raft_masks/<...>.png` masks
(channel 0 = cycle-consistency, channel 1 = occlusion).  These are
produced offline by a RAFT runner; this module only discovers and loads
them.

Deliberate parity deviation (docs/PARITY.md): when flow files are at a
different resolution than the training images, `load_flow` scales the
flow VALUES by (W/w, H/h) during resize (flow as physical pixel
displacement -> NDC-correct normalization); the reference interpolates
without value scaling (train_gui.py:330-341).  Bit-identical when the
resolutions match (the documented D-NeRF setup).
"""
from __future__ import annotations

import os

import numpy as np


def find_flow_dirs(source_path: str, samples) -> list[list[str]]:
    """Per-sample candidate flow files (scene/__init__.py:82-87)."""
    flow_dir = os.path.join(source_path, "raft_neighbouring")
    if not os.path.isdir(flow_dir):
        return [[] for _ in samples]
    flow_list = os.listdir(flow_dir)
    out = []
    for s in samples:
        stem = os.path.splitext(s.image_name)[0]
        out.append([os.path.join(flow_dir, f) for f in flow_list
                    if f.startswith(stem + ".")])
    return out


def target_name(flow_path: str) -> str:
    """Frame name the flow points AT (train_gui.py:332)."""
    return os.path.basename(flow_path).split("_")[-1].split(".")[0]


def load_flow(flow_path: str, H: int, W: int):
    """Returns (flow_norm [H,W,2] in NDC-ish [-2,2] units, mask [H,W,1]).

    flow is normalized by the image size *2 like the reference
    (train_gui.py:339); the mask is (cycle_consistency | occlusion).
    Both are resized to (H, W) when the files are at another
    resolution."""
    from PIL import Image
    flow = np.load(flow_path).astype(np.float32)           # [h,w,2]
    mask_path = flow_path.replace("raft_neighbouring", "raft_masks") \
        .replace(".npy", ".png")
    if os.path.exists(mask_path):
        masks = np.asarray(Image.open(mask_path), np.float32) / 255.0
    else:
        masks = np.ones(flow.shape[:2] + (2,), np.float32)
    if flow.shape[0] != H or flow.shape[1] != W:
        sy, sx = H / flow.shape[0], W / flow.shape[1]
        fi = Image.fromarray(flow[..., 0]).resize((W, H), Image.BILINEAR)
        fj = Image.fromarray(flow[..., 1]).resize((W, H), Image.BILINEAR)
        flow = np.stack([np.asarray(fi) * sx, np.asarray(fj) * sy], -1)
        mi = Image.fromarray((masks[..., 0] * 255).astype(np.uint8)) \
            .resize((W, H), Image.NEAREST)
        mo = Image.fromarray((masks[..., 1] * 255).astype(np.uint8)) \
            .resize((W, H), Image.NEAREST)
        masks = np.stack([np.asarray(mi), np.asarray(mo)], -1) / 255.0
    flow_norm = flow / np.array([W, H], np.float32) * 2.0
    mask = ((masks[..., 0] > 0) | (masks[..., 1] > 0)).astype(np.float32)
    return flow_norm, mask[..., None]
