"""CLI smoke: train a few hundred iterations on a tiny on-disk blender
dataset, then render + mesh from the saved checkpoint — the user journey
of train_gui.py / render.py / render_mesh.py."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-suite only (see pytest.ini)


@pytest.fixture(scope="module")
def blender_dir(tmp_path_factory):
    """Write a tiny D-NeRF-format dataset rendered from the synthetic
    Gaussian scene, so the CLI exercises the real reader."""
    import jax
    from PIL import Image

    from d2dgs_tpu.data.synthetic import make_video_dataset

    root = tmp_path_factory.mktemp("blender")
    cams, imgs, pts, cols = make_video_dataset(
        jax.random.PRNGKey(3), n_cams=6, n_times=3, H=48, W=48, n_gauss=16)

    for split, idx in (("train", range(4)), ("test", range(4, 6))):
        frames = []
        os.makedirs(root / split, exist_ok=True)
        for k in idx:
            cam, img = cams[k], np.asarray(imgs[k])
            # invert make_camera's convention back to a blender c2w
            w2c = np.asarray(cam.w2c, np.float64)
            c2w = np.linalg.inv(w2c)
            c2w[:3, 1:3] *= -1  # OpenCV -> OpenGL axes
            rgba = np.concatenate(
                [img, (img.sum(-1, keepdims=True) > 0.02).astype(
                    np.float32)], -1)
            name = f"r_{k}"
            Image.fromarray((np.clip(rgba, 0, 1) * 255).astype(
                np.uint8)).save(root / split / f"{name}.png")
            frames.append({"file_path": f"./{split}/{name}",
                           "time": float(cam.time),
                           "transform_matrix": c2w.tolist()})
        fovx = 2 * np.arctan(48 / (2 * float(cams[0].fx)))
        with open(root / f"transforms_{split}.json", "w") as fh:
            json.dump({"camera_angle_x": float(fovx), "frames": frames},
                      fh)
    return str(root)


def test_cli_train_render_mesh(blender_dir, tmp_path):
    model = str(tmp_path / "model")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU relay in subprocesses
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    common = ["--source_path", blender_dir, "--model_path", model,
              "--sh_degree", "1", "--hyper_dim", "2", "--node_num", "16",
              "--gaussian_capacity", "512", "--node_gauss_capacity", "256",
              "--raster_tile_cap", "256", "--raster_chunk", "64"]
    train = [sys.executable, "-m", "d2dgs_tpu.cli", "train", *common,
             "--warm_up", "30", "--node_warm_up", "60",
             "--iterations_node_sampling", "120",
             "--iterations_node_rendering", "160", "--iterations", "60",
             "--densification_interval", "25", "--densify_from_iter", "20",
             "--opacity_reset_interval", "10000",
             "--normal_dist_from_iter", "40",
             "--node_force_densify_prune_step", "1000",
             "--test_iterations", "50", "--save_iterations", "50",
             "--log_every", "50"]
    r = subprocess.run(train, capture_output=True, text=True, env=env,
                       cwd="/root/repo", timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(model, "ckpt.npz"))
    assert os.path.exists(os.path.join(model, "cfg_args.json"))
    assert os.path.exists(os.path.join(
        model, "point_cloud/iteration_50/point_cloud.ply"))

    render = [sys.executable, "-m", "d2dgs_tpu.cli", "render",
              "--source_path", blender_dir, "--model_path", model,
              "--ckpt", "ckpt.npz"]
    r = subprocess.run(render, capture_output=True, text=True, env=env,
                       cwd="/root/repo", timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    with open(os.path.join(model, "results.json")) as fh:
        res = json.load(fh)
    assert np.isfinite(res["psnr"])

    mesh = [sys.executable, "-m", "d2dgs_tpu.cli", "mesh",
            "--source_path", blender_dir, "--model_path", model,
            "--ckpt", "ckpt.npz", "--voxel_size", "0.08",
            "--max_times", "1"]
    r = subprocess.run(mesh, capture_output=True, text=True, env=env,
                       cwd="/root/repo", timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(model, "mesh", "mesh_0000.ply"))

    # interactive-editing workflow (train_gui.py keypoint drag +
    # lap_deform.py): drag a handle near the scene center along a short
    # trajectory, re-skin, render frames + GIF
    edit = [sys.executable, "-m", "d2dgs_tpu.cli", "edit",
            "--source_path", blender_dir, "--model_path", model,
            "--ckpt", "ckpt.npz", "--handle", "0,0,0",
            "--drag", "0.3,0.1,0", "--n_frames", "3", "--rings", "1",
            "--n_anchors", "4"]
    r = subprocess.run(edit, capture_output=True, text=True, env=env,
                       cwd="/root/repo", timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(model, "edit", "frame_0002.png"))
    assert os.path.exists(os.path.join(model, "edit", "edit.gif"))


def test_cfg_args_merge(tmp_path):
    from d2dgs_tpu.cli import merge_cfg_args, save_cfg_args
    import argparse

    ns = argparse.Namespace(model_path=str(tmp_path), node_num=64,
                            hyper_dim=8)
    save_cfg_args(str(tmp_path), ns)
    fresh = argparse.Namespace(model_path=str(tmp_path), node_num=1024,
                               hyper_dim=8)
    merged = merge_cfg_args(fresh)
    assert merged.node_num == 64  # saved training flag wins over default
