"""Blender/D-NeRF reader on a synthetic mini-dataset."""
import json
import os

import numpy as np
import pytest

from d2dgs_tpu.data.dnerf import load_scene


@pytest.fixture(scope="module")
def blender_dir(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("mini_blender")
    H = W = 16
    rng = np.random.RandomState(0)

    def make_split(name, n):
        frames = []
        os.makedirs(root / name, exist_ok=True)
        for i in range(n):
            ang = 2 * np.pi * i / n
            c2w = np.eye(4)
            # camera on a ring, OpenGL convention (z-back)
            c2w[:3, 3] = [4 * np.sin(ang), 0.0, 4 * np.cos(ang)]
            c2w[:3, :3] = np.array([
                [np.cos(ang), 0, np.sin(ang)],
                [0, 1, 0],
                [-np.sin(ang), 0, np.cos(ang)]])
            rgba = rng.randint(0, 255, (H, W, 4), dtype=np.uint8)
            fp = f"./{name}/r_{i}"
            Image.fromarray(rgba, "RGBA").save(root / name / f"r_{i}.png")
            frames.append({"file_path": fp, "time": i / max(n - 1, 1),
                           "transform_matrix": c2w.tolist()})
        with open(root / f"transforms_{name}.json", "w") as f:
            json.dump({"camera_angle_x": 0.69, "frames": frames}, f)

    make_split("train", 4)
    make_split("test", 2)
    return str(root)


def test_load_blender(blender_dir):
    info = load_scene(blender_dir, num_init_points=512)
    assert len(info.train_cameras) == 4
    assert len(info.test_cameras) == 2
    s = info.train_cameras[0]
    assert s.image.shape == (16, 16, 3)
    assert s.alpha.shape == (16, 16, 1)
    assert s.camera.H == 16 and s.camera.W == 16
    assert float(s.camera.time) == 0.0
    assert float(info.train_cameras[-1].camera.time) == 1.0
    # cameras sit on a radius-4 ring around the origin
    c = np.asarray(s.camera.cam_center)
    np.testing.assert_allclose(np.linalg.norm(c), 4.0, rtol=1e-5)
    assert 3.9 < info.cameras_extent < 8.1
    assert info.init_points.shape == (512, 3)
    assert np.abs(info.init_points).max() <= 1.3

    # w2c must map the camera center to the origin
    h = np.concatenate([c, [1.0]])
    np.testing.assert_allclose((np.asarray(s.camera.w2c) @ h)[:3], 0.0,
                               atol=1e-5)

    # gt compositing
    bg = np.ones(3, np.float32)
    gt = s.gt(bg)
    assert gt.shape == (16, 16, 3)
    np.testing.assert_allclose(
        gt, s.image * s.alpha + (1 - s.alpha), rtol=1e-6)
