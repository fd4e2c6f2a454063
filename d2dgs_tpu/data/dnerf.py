"""D-NeRF / Blender dataset reader + Scene facade.

Reference: scene/dataset_readers.py:272-391 (readCamerasFromTransforms /
readNerfSyntheticInfo) and scene/__init__.py:41-119 (Scene).  Host-side
numpy/PIL only — arrays go to device when the trainer batches them.
"""
from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from ..utils import graphics
from .cameras import Camera, make_camera


@dataclasses.dataclass
class CameraSample:
    """One (camera, frame) training sample."""
    camera: Camera
    image: np.ndarray            # [H,W,3] float32 in [0,1], NOT composited
    alpha: np.ndarray | None     # [H,W,1] float32 mask (None if RGB input)
    image_name: str = ""

    def gt(self, bg: np.ndarray) -> np.ndarray:
        """Ground-truth for the loss: mask-composited onto bg — the
        reference's `gt_alpha_mask_as_scene_mask` path
        (train_gui.py:303-309)."""
        if self.alpha is None:
            return self.image
        return self.image * self.alpha + bg * (1.0 - self.alpha)


@dataclasses.dataclass
class SceneInfo:
    train_cameras: list
    test_cameras: list
    nerf_norm: dict               # {"translate": [3], "radius": float}
    init_points: np.ndarray       # [P,3]
    init_colors: np.ndarray       # [P,3]

    @property
    def cameras_extent(self) -> float:
        return float(self.nerf_norm["radius"])


def _blender_Rt(transform_matrix: np.ndarray):
    """c2w (OpenGL, y-up/z-back) -> reference (R, T) convention
    (dataset_readers.py:293-296: R stored as c2w rotation with the y/z
    axis flip folded in)."""
    matrix = np.linalg.inv(np.asarray(transform_matrix, np.float64))
    R = -np.transpose(matrix[:3, :3])
    R[:, 0] = -R[:, 0]
    T = -matrix[:3, 3]
    return R, T


def read_transforms(path: str, transformsfile: str,
                    extension: str = ".png") -> list[CameraSample]:
    """Parse one transforms_*.json (dataset_readers.py:272-325).
    Frames are sorted by the trailing integer of their file name; `time`
    comes from the json or frame index."""
    from PIL import Image

    with open(os.path.join(path, transformsfile)) as f:
        contents = json.load(f)
    fovx = contents["camera_angle_x"]
    frames = sorted(
        contents["frames"],
        key=lambda x: int(
            os.path.basename(x["file_path"]).split(".")[0].split("_")[-1]))

    out = []
    for idx, frame in enumerate(frames):
        fp = frame["file_path"]
        if not (fp.endswith(".jpg") or fp.endswith(".png")):
            fp = fp + extension
        t = frame["time"] if "time" in frame else idx / len(frames)
        R, T = _blender_Rt(frame["transform_matrix"])

        img = Image.open(os.path.join(path, fp))
        data = np.asarray(img.convert("RGBA"), np.float32) / 255.0
        rgb, alpha = data[..., :3], data[..., 3:4]
        H, W = rgb.shape[:2]
        fovy = graphics.focal2fov(graphics.fov2focal(fovx, W), H)
        # NOTE the reference swaps FovX/FovY for blender scenes
        # (dataset_readers.py:320-322); W==H for D-NeRF so it is benign,
        # we keep the natural assignment.
        cam = make_camera(R, T, fovx, fovy, H, W, time=float(t))
        out.append(CameraSample(camera=cam, image=rgb, alpha=alpha,
                                image_name=os.path.basename(fp)))
    return out


def get_nerfpp_norm(samples: list[CameraSample]) -> dict:
    """Camera-ring normalization (dataset_readers.py:79-113, apply=False)."""
    centers = np.stack([np.asarray(s.camera.cam_center) for s in samples])
    center = centers.mean(axis=0)
    radius = float(np.max(np.linalg.norm(centers - center, axis=-1)))
    return {"translate": -center, "radius": radius}


def load_blender_scene(path: str, eval_split: bool = True,
                       extension: str = ".png",
                       num_init_points: int = 100_000,
                       seed: int = 0) -> SceneInfo:
    """readNerfSyntheticInfo (dataset_readers.py:328-391): train/test
    camera lists + random init cloud in the Blender bounds."""
    train = read_transforms(path, "transforms_train.json", extension)
    test_file = os.path.join(path, "transforms_test.json")
    test = (read_transforms(path, "transforms_test.json", extension)
            if os.path.exists(test_file) else [])
    if not eval_split:
        train = train + test

    rng = np.random.RandomState(seed)
    pts = rng.random((num_init_points, 3)) * 2.6 - 1.3
    # SH2RGB(random/255) ≈ 0.5 + tiny noise (dataset_readers.py:388-390)
    cols = 0.5 + 0.28209479177387814 * rng.random((num_init_points, 3)) / 255

    return SceneInfo(train_cameras=train, test_cameras=test,
                     nerf_norm=get_nerfpp_norm(train),
                     init_points=pts.astype(np.float32),
                     init_colors=cols.astype(np.float32))


def load_scene(path: str, **kw) -> SceneInfo:
    """Dataset-type sniffing by sentinel file (scene/__init__.py:45-66).
    All readers share the SceneInfo contract."""
    exists = lambda *p: os.path.exists(os.path.join(path, *p))  # noqa: E731
    if exists("sparse") or exists("colmap_sparse"):
        from .colmap import load_colmap_scene
        return load_colmap_scene(path, **kw)
    if exists("transforms_train.json"):
        return load_blender_scene(path, **kw)
    if exists("cameras_sphere.npz"):
        from .dtu import load_dtu_scene
        return load_dtu_scene(path, **kw)
    if exists("dataset.json"):
        from .nerfies import load_nerfies_scene
        return load_nerfies_scene(path, **kw)
    if exists("poses_bounds.npy"):
        from .plenoptic import load_plenoptic_scene
        return load_plenoptic_scene(path, **kw)
    if exists("transforms.json"):  # Dynamic-360 (single transforms file)
        train = read_transforms(path, "transforms.json")
        rng = np.random.RandomState(kw.get("seed", 0))
        n = kw.get("num_init_points", 100_000)
        pts = rng.random((n, 3)) * 2.6 - 1.3
        cols = 0.5 + 0.28209479177387814 * rng.random((n, 3)) / 255
        return SceneInfo(train_cameras=train, test_cameras=[],
                         nerf_norm=get_nerfpp_norm(train),
                         init_points=pts.astype(np.float32),
                         init_colors=cols.astype(np.float32))
    if exists("train_meta.json"):
        from .cmu import load_cmu_scene
        return load_cmu_scene(path, **kw)
    raise ValueError(f"unrecognised dataset layout at {path}")
