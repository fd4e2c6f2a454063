"""TSDF fusion + isosurface extraction, TPU-native.

The reference fuses masked depth maps with Open3D's ScalableTSDFVolume
(utils/mesh_utils.py:158-199: voxel 0.004, sdf_trunc 5*voxel, depth_trunc
6, depth zeroed where gt_alpha_mask < 0.5) and filters small clusters
(post_process_mesh, mesh_utils.py:24-45).  Open3D is not available (and is
CPU-only anyway); here:

* `TsdfVolume` is a dense [X,Y,Z] grid pytree; `integrate_view` is a pure
  jittable projective update (vectorized over all voxels — one matmul +
  bilinear gather per view, XLA-friendly).
* `extract_mesh` runs marching TETRAHEDRA in jnp (6 tets per cube; no
  256-case tables, fully vectorized, static shapes) and compacts the
  triangle soup on the host.
* `largest_components` reimplements the cluster filter with
  scipy.sparse.csgraph on vertex adjacency.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.cameras import Camera


class TsdfVolume(NamedTuple):
    tsdf: jnp.ndarray      # [X,Y,Z] truncated signed distance (init 1)
    weight: jnp.ndarray    # [X,Y,Z] accumulation weight
    color: jnp.ndarray     # [3,X,Y,Z] accumulated color (channel-MAJOR:
    #                        a [...,3] layout lane-pads the minor dim
    #                        3->128 on TPU — 42x memory, OOM at
    #                        voxel 0.008 / 34M-voxel production grids)
    origin: jnp.ndarray    # [3] world position of voxel (0,0,0)
    voxel: float           # voxel edge length (static)
    sdf_trunc: float       # truncation distance (static)


def make_volume(bounds_min, bounds_max, voxel: float = 0.004,
                sdf_trunc: float | None = None) -> TsdfVolume:
    bmin = np.asarray(bounds_min, np.float32)
    bmax = np.asarray(bounds_max, np.float32)
    dims = np.maximum(np.ceil((bmax - bmin) / voxel).astype(int) + 1, 2)
    if sdf_trunc is None:
        sdf_trunc = 5.0 * voxel
    return TsdfVolume(
        tsdf=jnp.ones(tuple(dims), jnp.float32),
        weight=jnp.zeros(tuple(dims), jnp.float32),
        color=jnp.zeros((3,) + tuple(dims), jnp.float32),
        origin=jnp.asarray(bmin),
        voxel=float(voxel), sdf_trunc=float(sdf_trunc))


@partial(jax.jit, static_argnames=("depth_trunc",))
def integrate_view(vol: TsdfVolume, depth: jnp.ndarray, rgb: jnp.ndarray,
                   cam: Camera, depth_trunc: float = 6.0) -> TsdfVolume:
    """Integrate one view (depth [H,W], rgb [H,W,3]).  Zero/invalid depth
    pixels contribute nothing (the reference's mask step zeroes depth).

    All per-voxel intermediates are kept as 1-D [M] arrays (component-
    wise math) — a [M,3] array's minor dim lane-pads 3->128 on TPU,
    turning 415 MB of coordinates into 17.7 GB at production grids."""
    X, Y, Z = vol.tsdf.shape
    ii, jj, kk = jnp.meshgrid(jnp.arange(X), jnp.arange(Y), jnp.arange(Z),
                              indexing="ij")
    px = vol.origin[0] + vol.voxel * ii.reshape(-1).astype(jnp.float32)
    py = vol.origin[1] + vol.voxel * jj.reshape(-1).astype(jnp.float32)
    pz = vol.origin[2] + vol.voxel * kk.reshape(-1).astype(jnp.float32)
    # world -> camera, component-wise
    R = cam.w2c[:3, :3]
    t = cam.w2c[:3, 3]
    pcx = R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz + t[0]
    pcy = R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz + t[1]
    z = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz + t[2]
    u = pcx / z * cam.fx + cam.W / 2.0
    v = pcy / z * cam.fy + cam.H / 2.0
    ui = jnp.clip(jnp.round(u - 0.5).astype(jnp.int32), 0, cam.W - 1)
    vi = jnp.clip(jnp.round(v - 0.5).astype(jnp.int32), 0, cam.H - 1)
    in_img = (z > 0) & (u >= 0) & (u < cam.W) & (v >= 0) & (v < cam.H)

    d = depth[vi, ui]
    valid = in_img & (d > 0) & (d < depth_trunc)
    sdf = d - z
    valid = valid & (sdf > -vol.sdf_trunc)
    tsdf_new = jnp.clip(sdf / vol.sdf_trunc, -1.0, 1.0)

    w_old = vol.weight.reshape(-1)
    t_old = vol.tsdf.reshape(-1)
    w_add = valid.astype(jnp.float32)
    w_new = w_old + w_add
    safe = jnp.maximum(w_new, 1e-12)
    t_upd = (t_old * w_old + tsdf_new * w_add) / safe
    t_out = jnp.where(valid, t_upd, t_old)
    c_out = []
    for ch in range(3):
        c_old = vol.color[ch].reshape(-1)
        c_px = rgb[..., ch][vi, ui]
        c_upd = (c_old * w_old + c_px * w_add) / safe
        c_out.append(jnp.where(valid, c_upd, c_old).reshape(X, Y, Z))
    return vol._replace(tsdf=t_out.reshape(X, Y, Z),
                        weight=w_new.reshape(X, Y, Z),
                        color=jnp.stack(c_out, axis=0))


# ----------------------------------------------------------------------
# Marching tetrahedra
# ----------------------------------------------------------------------

# each cube splits into 6 tets over corners indexed 0..7 (binary xyz)
_TETS = np.array([
    [0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
    [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6]], np.int32)
_CORNER = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                    for z in (0, 1)], np.int32)  # corner i = bits xyz
# triangle emission per 4-bit tet sign case: up to 2 triangles, each vertex
# is an edge (pair of tet-corner indices); -1 padding.
_TET_TRIS = -np.ones((16, 2, 3, 2), np.int32)


def _set_case(case, tris):
    _TET_TRIS[case, :len(tris)] = np.asarray(tris, np.int32)


# cases: bit i set <=> corner i inside (tsdf < 0); edges written so the
# triangle winding is consistent (normal toward outside)
_set_case(0b0001, [[(0, 1), (0, 2), (0, 3)]])
_set_case(0b1110, [[(0, 1), (0, 3), (0, 2)]])
_set_case(0b0010, [[(1, 0), (1, 3), (1, 2)]])
_set_case(0b1101, [[(1, 0), (1, 2), (1, 3)]])
_set_case(0b0100, [[(2, 0), (2, 1), (2, 3)]])
_set_case(0b1011, [[(2, 0), (2, 3), (2, 1)]])
_set_case(0b1000, [[(3, 0), (3, 2), (3, 1)]])
_set_case(0b0111, [[(3, 0), (3, 1), (3, 2)]])
_set_case(0b0011, [[(0, 2), (1, 3), (0, 3)], [(0, 2), (1, 2), (1, 3)]])
_set_case(0b1100, [[(0, 2), (0, 3), (1, 3)], [(0, 2), (1, 3), (1, 2)]])
_set_case(0b0101, [[(0, 1), (2, 3), (0, 3)], [(0, 1), (2, 1), (2, 3)]])
_set_case(0b1010, [[(0, 1), (0, 3), (2, 3)], [(0, 1), (2, 3), (2, 1)]])
_set_case(0b0110, [[(1, 0), (2, 3), (1, 3)], [(1, 0), (2, 0), (2, 3)]])
_set_case(0b1001, [[(1, 0), (1, 3), (2, 3)], [(1, 0), (2, 3), (2, 0)]])


@jax.jit
def _march(tsdf: jnp.ndarray, weight: jnp.ndarray, origin, voxel: float):
    """Vectorized marching tetrahedra at iso 0.  Returns a dense triangle
    soup [Ncube, 6, 2, 3, 3] + validity mask; host compacts it."""
    X, Y, Z = tsdf.shape
    ii, jj, kk = jnp.meshgrid(jnp.arange(X - 1), jnp.arange(Y - 1),
                              jnp.arange(Z - 1), indexing="ij")
    base = jnp.stack([ii, jj, kk], -1).reshape(-1, 3)      # [C,3]
    corners = base[:, None, :] + jnp.asarray(_CORNER)[None]  # [C,8,3]
    cx, cy, cz = corners[..., 0], corners[..., 1], corners[..., 2]
    vals = tsdf[cx, cy, cz]                                 # [C,8]
    wts = weight[cx, cy, cz]
    observed = jnp.all(wts > 0, axis=-1)

    tet_corners = corners[:, jnp.asarray(_TETS)]            # [C,6,4,3]
    tet_vals = vals[:, jnp.asarray(_TETS)]                  # [C,6,4]
    inside = tet_vals < 0.0
    case = (inside[..., 0].astype(jnp.int32)
            | (inside[..., 1].astype(jnp.int32) << 1)
            | (inside[..., 2].astype(jnp.int32) << 2)
            | (inside[..., 3].astype(jnp.int32) << 3))      # [C,6]

    tris = jnp.asarray(_TET_TRIS)[case]                     # [C,6,2,3,2]
    valid_tri = tris[..., 0, 0] >= 0                        # [C,6,2]
    e0 = jnp.clip(tris[..., 0], 0, 3)
    e1 = jnp.clip(tris[..., 1], 0, 3)

    # edge-endpoint gather via take_along_axis on broadcast arrays
    tc = tet_corners[:, :, None].astype(jnp.float32)        # [C,6,1,4,3]
    tv = tet_vals[:, :, None]                               # [C,6,1,4]
    p0 = jnp.take_along_axis(
        jnp.broadcast_to(tc, tc.shape[:2] + (2, 4, 3)),
        e0[..., None], axis=3)                              # [C,6,2,3,3]
    p1 = jnp.take_along_axis(
        jnp.broadcast_to(tc, tc.shape[:2] + (2, 4, 3)),
        e1[..., None], axis=3)
    v0 = jnp.take_along_axis(
        jnp.broadcast_to(tv, tv.shape[:2] + (2, 4)), e0, axis=3)
    v1 = jnp.take_along_axis(
        jnp.broadcast_to(tv, tv.shape[:2] + (2, 4)), e1, axis=3)

    t = v0 / jnp.where(jnp.abs(v0 - v1) < 1e-12, 1e-12, v0 - v1)
    t = jnp.clip(t, 0.0, 1.0)[..., None]
    verts = p0 + t * (p1 - p0)                              # [C,6,2,3,3]
    verts = origin[None, None, None, None, :] + voxel * verts
    valid = valid_tri & observed[:, None, None]
    return verts, valid


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("cap",))
def _march_compact(tsdf, weight, origin, voxel, cap: int):
    """March one slab and compact valid triangles on-device into a
    fixed [cap,3,3] buffer (host transfers stay small).  Returns
    (buf, count) — count may exceed cap (overflow; caller asserts)."""
    verts, valid = _march(tsdf, weight, origin, voxel)
    flat_v = verts.reshape(-1, 3, 3)
    flat_ok = valid.reshape(-1)
    rank = jnp.cumsum(flat_ok.astype(jnp.int32)) - 1
    dest = jnp.where(flat_ok & (rank < cap), rank, cap)
    buf = jnp.zeros((cap + 1, 3, 3), jnp.float32).at[dest].set(
        flat_v, mode="drop")
    return buf[:cap], jnp.sum(flat_ok.astype(jnp.int32))


def extract_mesh(vol: TsdfVolume, slab: int = 8, tri_cap: int = 400_000):
    """-> (vertices [V,3] float32, faces [F,3] int32) on the host, with
    vertices deduplicated (welded) so connectivity filters work.

    The volume is marched in X-slabs of `slab` cube planes: the marching
    buffers are [cubes, 6, 2, 3, 3] floats, which at production grids
    (200^3+) would need tens of GB if materialized whole-volume."""
    X, Y, Z = vol.tsdf.shape
    n_slabs = max((X - 1 + slab - 1) // slab, 1)
    # pad X so every slab slice has identical static shape [slab+1,Y,Z];
    # padded rows carry weight 0 => observed=False => no triangles
    Xp = n_slabs * slab + 1
    tsdf = jnp.concatenate(
        [vol.tsdf, jnp.ones((Xp - X, Y, Z), vol.tsdf.dtype)], axis=0) \
        if Xp > X else vol.tsdf
    wt = jnp.concatenate(
        [vol.weight, jnp.zeros((Xp - X, Y, Z), vol.weight.dtype)],
        axis=0) if Xp > X else vol.weight
    tris = []
    for s in range(n_slabs):
        x0 = s * slab
        o = vol.origin + jnp.asarray([x0 * vol.voxel, 0.0, 0.0])
        buf, cnt = _march_compact(
            jax.lax.dynamic_slice_in_dim(tsdf, x0, slab + 1, 0),
            jax.lax.dynamic_slice_in_dim(wt, x0, slab + 1, 0),
            o, vol.voxel, tri_cap)
        cnt = int(cnt)
        assert cnt <= tri_cap, \
            f"slab {s}: {cnt} triangles > cap {tri_cap}"
        if cnt:
            tris.append(np.asarray(buf[:cnt]))
    if not tris:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    tri = np.concatenate(tris, axis=0)                     # [F,3,3]
    # weld on a voxel/1024 grid (C++ host runtime, numpy fallback inside)
    from ..native import weld_mesh
    return weld_mesh(tri, vol.voxel / 1024.0)


@jax.jit
def sample_colors(vol: TsdfVolume, verts: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample of the fused color volume at vertex positions
    (Open3D's extract_triangle_mesh bakes vertex colors the same way)."""
    g = (verts - vol.origin[None, :]) / vol.voxel
    X, Y, Z = vol.tsdf.shape
    g0 = jnp.floor(g).astype(jnp.int32)
    f = g - g0
    acc = jnp.zeros((verts.shape[0], 3), jnp.float32)
    wacc = jnp.zeros((verts.shape[0], 1), jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ii = jnp.clip(g0[:, 0] + dx, 0, X - 1)
                jj = jnp.clip(g0[:, 1] + dy, 0, Y - 1)
                kk = jnp.clip(g0[:, 2] + dz, 0, Z - 1)
                w = (jnp.abs(1 - dx - f[:, 0]) * jnp.abs(1 - dy - f[:, 1])
                     * jnp.abs(1 - dz - f[:, 2]))
                w = w * (vol.weight[ii, jj, kk] > 0)
                acc = acc + w[:, None] * vol.color[:, ii, jj, kk].T
                wacc = wacc + w[:, None]
    return acc / jnp.maximum(wacc, 1e-8)


def largest_components(verts: np.ndarray, faces: np.ndarray,
                       keep: int = 1, min_ratio: float = 0.0):
    """Keep the `keep` largest connected components by triangle count
    (post_process_mesh, mesh_utils.py:24-45 keeps cluster_to_keep=1000 for
    sequences / 1 for single meshes).  Union-find in the C++ host runtime
    (d2dgs_tpu.native), numpy/scipy fallback inside."""
    from ..native import filter_components
    if faces.shape[0] == 0:
        return verts, faces
    return filter_components(verts, faces, keep=keep, min_ratio=min_ratio)


def load_mesh_ply(path: str):
    """Read a triangle-mesh PLY written by ``save_mesh_ply`` (binary
    little-endian, optional uchar colors).  Returns (verts [V,3] f32,
    faces [F,3] i32)."""
    with open(path, "rb") as fh:
        header = []
        while True:
            line = fh.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        n = int(next(h for h in header if h.startswith("element vertex")
                     ).split()[-1])
        f = int(next(h for h in header if h.startswith("element face")
                     ).split()[-1])
        has_c = any("uchar red" in h for h in header)
        vt = (np.dtype([("p", "<f4", 3), ("c", "u1", 3)]) if has_c
              else np.dtype([("p", "<f4", 3)]))
        va = np.frombuffer(fh.read(n * vt.itemsize), vt)
        ft = np.dtype([("k", "u1"), ("i", "<i4", 3)])
        fa = np.frombuffer(fh.read(f * ft.itemsize), ft)
    return va["p"].astype(np.float32), fa["i"].astype(np.int32)


def save_mesh_ply(path: str, verts: np.ndarray, faces: np.ndarray,
                  colors: np.ndarray | None = None) -> None:
    """Binary little-endian triangle-mesh PLY."""
    import os
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n, f = verts.shape[0], faces.shape[0]
    has_c = colors is not None
    lines = ["ply", "format binary_little_endian 1.0",
             f"element vertex {n}",
             "property float x", "property float y", "property float z"]
    if has_c:
        lines += ["property uchar red", "property uchar green",
                  "property uchar blue"]
    lines += [f"element face {f}",
              "property list uchar int vertex_indices", "end_header"]
    with open(path, "wb") as fh:
        fh.write(("\n".join(lines) + "\n").encode("ascii"))
        if has_c:
            c8 = np.clip(colors * 255, 0, 255).astype(np.uint8)
            vt = np.dtype([("p", "<f4", 3), ("c", "u1", 3)])
            arr = np.empty(n, vt)
            arr["p"] = verts.astype("<f4")
            arr["c"] = c8
            fh.write(arr.tobytes())
        else:
            fh.write(verts.astype("<f4").tobytes())
        ft = np.dtype([("k", "u1"), ("v", "<i4", 3)])
        farr = np.empty(f, ft)
        farr["k"] = 3
        farr["v"] = faces.astype("<i4")
        fh.write(farr.tobytes())
