"""Dataset readers (COLMAP / Neu3D / DTU / CMU) against synthetic
on-disk fixtures — the formats the reference sniffs in
scene/__init__.py:45-66."""
import json
import os
import struct

import numpy as np
import pytest

from d2dgs_tpu.data import colmap
from d2dgs_tpu.data.dnerf import load_scene
from d2dgs_tpu.data.dtu import decompose_projection
from d2dgs_tpu.data.plenoptic import _poses_from_bounds


def _png(path, H=8, W=8, rgba=False, value=128):
    from PIL import Image
    c = 4 if rgba else 3
    arr = np.full((H, W, c), value, np.uint8)
    Image.fromarray(arr, "RGBA" if rgba else "RGB").save(path)


def _write_colmap_binary(sparse, n_imgs=4):
    os.makedirs(sparse, exist_ok=True)
    with open(os.path.join(sparse, "cameras.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", 1))
        fh.write(struct.pack("<iiQQ", 1, 1, 8, 8))   # PINHOLE 8x8
        fh.write(struct.pack("<4d", 10.0, 10.0, 4.0, 4.0))
    with open(os.path.join(sparse, "images.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", n_imgs))
        for i in range(n_imgs):
            fh.write(struct.pack("<i", i + 1))
            fh.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))
            fh.write(struct.pack("<3d", 0.1 * i, 0.0, 2.0))
            fh.write(struct.pack("<i", 1))
            fh.write(f"{i:04d}.png".encode() + b"\x00")
            fh.write(struct.pack("<Q", 1))
            fh.write(struct.pack("<ddq", 1.0, 2.0, -1))
    with open(os.path.join(sparse, "points3D.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", 2))
        for i in range(2):
            fh.write(struct.pack("<q", i))
            fh.write(struct.pack("<3d", i, 0.5, 0.25))
            fh.write(struct.pack("<3B", 255, 128, 0))
            fh.write(struct.pack("<d", 0.5))
            fh.write(struct.pack("<Q", 1))
            fh.write(struct.pack("<ii", 1, 0))


def test_colmap_binary_roundtrip(tmp_path):
    root = str(tmp_path)
    _write_colmap_binary(os.path.join(root, "sparse", "0"))
    os.makedirs(os.path.join(root, "images"))
    for i in range(4):
        _png(os.path.join(root, "images", f"{i:04d}.png"))

    cams, imgs, pts = colmap.load_sparse_model(
        os.path.join(root, "sparse", "0"))
    assert cams[1].model == "PINHOLE" and cams[1].width == 8
    assert len(imgs) == 4 and imgs[1].name == "0000.png"
    xyz, rgb, err = pts
    np.testing.assert_allclose(xyz[1], [1.0, 0.5, 0.25])
    np.testing.assert_allclose(rgb[0], [1.0, 128 / 255.0, 0.0])

    info = load_scene(root, llffhold=2)   # sniffs the sparse/ dir
    assert len(info.train_cameras) == 2 and len(info.test_cameras) == 2
    s = info.train_cameras[0]
    assert s.image.shape == (8, 8, 3)
    # identity qvec, tvec z=2 -> camera center at -R^T t = (−0.1i, 0, −2)
    assert abs(float(s.camera.cam_center[2]) + 2.0) < 1e-5
    assert info.init_points.shape[0] == 2


def test_colmap_text_model(tmp_path):
    sparse = str(tmp_path)
    with open(os.path.join(sparse, "cameras.txt"), "w") as fh:
        fh.write("# comment\n1 SIMPLE_PINHOLE 8 8 10.0 4.0 4.0\n")
    with open(os.path.join(sparse, "images.txt"), "w") as fh:
        fh.write("1 1 0 0 0 0 0 2 1 a.png\n1.0 2.0 -1\n")
    with open(os.path.join(sparse, "points3D.txt"), "w") as fh:
        fh.write("0 1 2 3 255 0 0 0.1 1 0\n")
    cams, imgs, pts = colmap.load_sparse_model(sparse)
    assert cams[1].model == "SIMPLE_PINHOLE"
    assert imgs[1].camera_id == 1
    np.testing.assert_allclose(pts[0][0], [1, 2, 3])
    fovx, fovy = colmap.colmap_focal_fov(cams[1])
    assert fovx == fovy  # single-focal model


def test_plenoptic_pose_shuffle():
    # canonical LLFF pose row: [down | right | back | center | hwf]
    c2w_llff = np.zeros((3, 5))
    c2w_llff[:, 0] = [0, -1, 0]   # down = -y
    c2w_llff[:, 1] = [1, 0, 0]    # right = +x
    c2w_llff[:, 2] = [0, 0, 1]    # back = +z (NeRF camera looks along -z)
    c2w_llff[:, 3] = [1, 2, 3]
    c2w_llff[:, 4] = [8, 8, 10]
    poses, (H, W, f) = _poses_from_bounds(c2w_llff.reshape(1, 15))
    assert (H, W, f) == (8, 8, 10.0)
    # identity-forward LLFF pose -> OpenCV c2w with +z forward
    np.testing.assert_allclose(poses[0][:3, 3], [1, 2, 3])
    np.testing.assert_allclose(np.linalg.det(poses[0][:3, :3]), 1.0,
                               atol=1e-9)


def test_dtu_decompose_projection():
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    t = np.array([0.5, -0.25, 2.0])
    P = K @ np.concatenate([Rz, t[:, None]], axis=1)
    K2, pose = decompose_projection(P)
    np.testing.assert_allclose(K2, K / K[2, 2], atol=1e-8)
    np.testing.assert_allclose(pose[:3, :3], Rz.T, atol=1e-8)
    np.testing.assert_allclose(pose[:3, 3], -Rz.T @ t, atol=1e-8)


def test_cmu_reader(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "ims/c0"))
    md = {"w": 8, "h": 8,
          "k": [[[[10, 0, 4], [0, 10, 4], [0, 0, 1]]]] * 2,
          "w2c": [[np.eye(4).tolist()]] * 2,
          "fn": [["c0/0.jpg"], ["c0/1.jpg"]]}
    with open(os.path.join(root, "train_meta.json"), "w") as fh:
        json.dump(md, fh)
    for i in range(2):
        _png(os.path.join(root, "ims", "c0", f"{i}.jpg"))
    np.savez(os.path.join(root, "init_pt_cld.npz"),
             data=np.random.rand(16, 6).astype(np.float32))

    info = load_scene(root)
    assert len(info.train_cameras) == 2
    assert info.init_points.shape == (16, 3)
    # recentred cloud has zero mean
    np.testing.assert_allclose(info.init_points.mean(0), 0.0, atol=1e-6)


def test_unknown_layout_raises(tmp_path):
    with pytest.raises(ValueError):
        load_scene(str(tmp_path))
