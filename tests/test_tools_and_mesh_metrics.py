"""Data-prep tools (d2dgs_tpu/tools), OBJ loading, and the mesh-image
metric driver (reference convert.py / data_tools / metrics_mesh.py /
read_gt_mesh.py equivalents)."""
import json
import os

import numpy as np
import pytest

from d2dgs_tpu.eval.mesh_metrics import (chamfer_distance,
                                         mesh_image_metrics, mesh_chamfer)
from d2dgs_tpu.mesh.obj import load_obj, load_obj_mtl


def test_load_obj(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text("# comment\nv 0 0 0\nv 1 0 0\nv 0 1 0\n"
                 "f 1/1/1 2/2/2 3/3/3\n")
    v, f = load_obj(str(p))
    assert v.shape == (3, 3) and f.shape == (1, 3)
    np.testing.assert_array_equal(f[0], [0, 1, 2])


def test_load_obj_mtl(tmp_path):
    (tmp_path / "m.obj").write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    (tmp_path / "m.mtl").write_text("newmtl red\nKd 0.9 0.1 0.2\n")
    v, f, c = load_obj_mtl(str(tmp_path / "m.obj"),
                           str(tmp_path / "m.mtl"))
    assert c.shape == (3, 3)
    np.testing.assert_allclose(c[0], [0.9, 0.1, 0.2])


def test_chamfer_zero_and_offset():
    rng = np.random.RandomState(0)
    a = rng.randn(256, 3).astype(np.float32)
    assert chamfer_distance(a, a) < 1e-4
    d = chamfer_distance(a, a + np.array([0.5, 0, 0], np.float32))
    assert 0.05 < d < 1.2


def test_mesh_chamfer_same_mesh(tmp_path):
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
    assert mesh_chamfer(v, f, v, f, n_samples=2000) < 0.1


def test_mesh_image_metrics(tmp_path):
    from PIL import Image
    rdir, gdir = tmp_path / "renders", tmp_path / "gt"
    rdir.mkdir(), gdir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(rdir / f"{i:05d}.png")
        Image.fromarray(img).save(gdir / f"{i:05d}.png")
    mean = mesh_image_metrics(str(rdir), str(gdir), str(tmp_path), "t")
    assert mean["psnr"] > 40.0
    saved = json.loads((tmp_path / "t_results.json").read_text())
    assert len(saved["per_view"]) == 3


def test_colmap2nerf_from_text(tmp_path):
    """transforms.json from a hand-built COLMAP text model (no colmap
    binary needed)."""
    from d2dgs_tpu.tools.colmap2nerf import colmap2nerf_invoke
    scene = tmp_path / "scene"
    (scene / "images").mkdir(parents=True)
    txt = scene / "colmap_text"
    txt.mkdir()
    (txt / "cameras.txt").write_text(
        "# cams\n1 OPENCV 640 480 500.0 500.0 320 240 0 0 0 0\n")
    # two cameras on the x axis looking roughly at the origin
    lines = ["# images"]
    for i, tx in enumerate([-1.0, 1.0]):
        lines.append(f"{i + 1} 1 0 0 0 {tx} 0.0 4.0 1 img_{i}.png")
        lines.append("0 0 -1")   # (points2d line, ignored)
    (txt / "images.txt").write_text("\n".join(lines) + "\n")
    out = colmap2nerf_invoke(str(scene / "images"), run_colmap=False)
    data = json.loads(open(out).read())
    assert len(data["frames"]) == 2
    assert abs(data["fl_x"] - 500.0) < 1e-6
    M = np.asarray(data["frames"][0]["transform_matrix"])
    assert M.shape == (4, 4)
    assert np.isfinite(M).all()


def test_phone_catch_mask_and_blur(tmp_path):
    from PIL import Image
    from d2dgs_tpu.tools.phone_catch import (mask_images, rename_images,
                                             select_ambiguity)
    imgs = tmp_path / "images"
    msks = tmp_path / "masks"
    imgs.mkdir(), msks.mkdir()
    rng = np.random.RandomState(0)
    for i in range(6):
        arr = (rng.rand(8, 8, 3) * 255).astype(np.uint8)
        if i == 3:
            arr[:] = arr.mean()     # a blurry frame
        Image.fromarray(arr).save(imgs / f"{i:05d}.png")
        Image.fromarray((np.ones((8, 8)) * 255).astype(np.uint8)).save(
            msks / f"{i:05d}.png")
    amb, _ = select_ambiguity(str(imgs), nb=4, threshold=0.5)
    assert any("00003" in a for a in amb)
    out = mask_images(str(imgs), str(msks))
    files = sorted(os.listdir(out))
    assert len(files) == 6
    assert np.asarray(Image.open(os.path.join(out, files[0]))).shape[-1] \
        == 4
    rename_images(out)
    assert sorted(os.listdir(out))[0] == "00000.png"
