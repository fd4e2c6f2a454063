"""Mesh re-rendering (reference mesh_renderer/__init__.py:67-225).

The reference renders extracted TSDF meshes two ways: nvdiffrast clip-space
rasterization with interpolated vertex colors (+antialias, white/black bg)
for `mesh_image/`, and a pytorch3d SoftPhong gray "shape" render for
`mesh_shape/`.  Both are CUDA-only libraries; here the rasterizer is a
static-shape scatter z-buffer that XLA maps to segment reductions:

  pass 1  per (triangle, patch-pixel): coverage + depth -> segment_min
          z-buffer over flat pixel ids
  pass 2  winning triangle id per pixel (min tri id among depth winners,
          a deterministic tie-break)
  pass 3  per-pixel barycentric attribute interpolation from the winning
          triangle (gather, perspective-correct)

Every triangle rasterizes an SxS pixel patch anchored at its screen bbox
(S = `patch`); TSDF meshes have voxel-scale triangles so S=16 covers them
at eval resolutions.  Triangles larger than the patch are rasterized
coarsely by the multi-pass `splits` grid.  Optional `supersample` gives
nvdiffrast-antialias-like edge quality by average-pooling.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..data.cameras import Camera

_NEAR = 0.01


def _project(cam: Camera, verts: jnp.ndarray):
    """world verts [V,3] -> (screen uv [V,2], camera z [V])."""
    pc = verts @ cam.w2c[:3, :3].T + cam.w2c[:3, 3]
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = pc[:, 0] / zs * cam.fx + cam.W / 2.0
    v = pc[:, 1] / zs * cam.fy + cam.H / 2.0
    return jnp.stack([u, v], -1), z


def _edge(a, b, p):
    """2x signed area of triangle (a,b,p); p may broadcast."""
    return ((b[..., 0] - a[..., 0]) * (p[..., 1] - a[..., 1])
            - (b[..., 1] - a[..., 1]) * (p[..., 0] - a[..., 0]))


@partial(jax.jit, static_argnames=("H", "W", "patch", "splits"))
def _raster_core(uv, z, faces, H: int, W: int, patch: int, splits: int):
    """Returns (win_tri [H*W] int32 (-1 = background), zbuf [H*W])."""
    F = faces.shape[0]
    tri_uv = uv[faces]                      # [F,3,2]
    tri_z = z[faces]                        # [F,3]
    visible = jnp.all(tri_z > _NEAR, axis=-1)

    bb_min = jnp.floor(jnp.min(tri_uv, axis=1))            # [F,2]
    bb_max = jnp.ceil(jnp.max(tri_uv, axis=1))
    ext = jnp.max(bb_max - bb_min, axis=-1)                # [F]
    # stride 1 for patch-sized tris; coarser for big ones (multi-pass grid)
    npix = jnp.float32(patch * splits)
    stride = jnp.maximum(jnp.ceil((ext + 1.0) / npix), 1.0)  # [F]

    dump = H * W                                           # trash slot
    n_seg = H * W + 1

    py, px = jnp.meshgrid(jnp.arange(patch * splits),
                          jnp.arange(patch * splits), indexing="ij")
    offs = jnp.stack([px, py], -1).reshape(-1, 2).astype(jnp.float32)

    def tri_cover(i):
        """[(patch*splits)^2] flat pixel ids + z for triangle i."""
        a, b, c = tri_uv[i, 0], tri_uv[i, 1], tri_uv[i, 2]
        zi = tri_z[i]
        pix = bb_min[i][None, :] + offs * stride[i]        # [K,2]
        p = pix + 0.5                                      # pixel centers
        area = _edge(a, b, c)
        sgn = jnp.where(area >= 0, 1.0, -1.0)
        w0 = _edge(b, c, p) * sgn
        w1 = _edge(c, a, p) * sgn
        w2 = _edge(a, b, p) * sgn
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (jnp.abs(area) > 1e-12)
        denom = jnp.maximum(jnp.abs(area), 1e-12)
        l0, l1, l2 = w0 / denom, w1 / denom, w2 / denom
        # perspective-correct depth: interpolate 1/z
        inv_z = l0 / zi[0] + l1 / zi[1] + l2 / zi[2]
        zp = 1.0 / jnp.maximum(inv_z, 1e-12)
        ui = jnp.floor(pix[:, 0]).astype(jnp.int32)
        vi = jnp.floor(pix[:, 1]).astype(jnp.int32)
        ok = (inside & visible[i] & (ui >= 0) & (ui < W)
              & (vi >= 0) & (vi < H))
        idx = jnp.where(ok, vi * W + ui, dump)
        return idx, jnp.where(ok, zp, jnp.inf)

    idx, zp = jax.vmap(tri_cover)(jnp.arange(F))           # [F,K]
    flat_idx = idx.reshape(-1)
    flat_z = zp.reshape(-1)

    zbuf = jax.ops.segment_min(flat_z, flat_idx, num_segments=n_seg)[:-1]
    # pass 2: winner = min tri id among fragments matching the z-buffer
    hit = flat_z <= zbuf[jnp.clip(flat_idx, 0, H * W - 1)] + 0.0
    hit = hit & (flat_idx < dump)
    tid = jnp.broadcast_to(jnp.arange(F)[:, None], idx.shape).reshape(-1)
    win = jax.ops.segment_min(jnp.where(hit, tid, jnp.int32(2**30)),
                              flat_idx, num_segments=n_seg)[:-1]
    win_tri = jnp.where(win >= 2**30, -1, win).astype(jnp.int32)
    return win_tri, zbuf


@partial(jax.jit, static_argnames=("H", "W", "patch", "splits"))
def _shade(cam: Camera, verts, faces, colors, bg, H: int, W: int,
           patch: int, splits: int):
    uv, z = _project(cam, verts)
    win_tri, zbuf = _raster_core(uv, z, faces, H, W, patch, splits)

    tri = jnp.clip(win_tri, 0, faces.shape[0] - 1)
    f = faces[tri]                                          # [HW,3]
    a, b, c = uv[f[:, 0]], uv[f[:, 1]], uv[f[:, 2]]
    za, zb, zc = z[f[:, 0]], z[f[:, 1]], z[f[:, 2]]
    jj, ii = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    p = jnp.stack([ii.reshape(-1) + 0.5, jj.reshape(-1) + 0.5], -1)
    area = _edge(a, b, c)
    denom = jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    l0 = _edge(b, c, p) / denom
    l1 = _edge(c, a, p) / denom
    l2 = _edge(a, b, p) / denom
    inv_z = (l0 / za + l1 / zb + l2 / zc)
    inv_z = jnp.maximum(inv_z, 1e-12)
    # perspective-correct vertex-attribute interpolation
    ca, cb, cc = colors[f[:, 0]], colors[f[:, 1]], colors[f[:, 2]]
    rgb = (l0[:, None] * ca / za[:, None] + l1[:, None] * cb / zb[:, None]
           + l2[:, None] * cc / zc[:, None]) / inv_z[:, None]
    mask = (win_tri >= 0)[:, None]
    img = jnp.where(mask, rgb, bg[None, :])
    depth = jnp.where(win_tri >= 0, zbuf, 0.0)
    return (img.reshape(H, W, 3), depth.reshape(H, W),
            mask.reshape(H, W).astype(jnp.float32))


def _subdivide_to_budget(verts, faces, colors, cam: Camera, budget: float,
                         max_rounds: int = 10):
    """Host-side midpoint subdivision of triangles whose screen bbox
    exceeds the per-triangle sample budget, so `_raster_core` covers
    every pixel with stride 1.  Exact for this renderer: geometry is
    unchanged and midpoint colors = linear interpolation, matching the
    perspective-correct barycentric shading."""
    import numpy as np
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int64)
    colors = np.asarray(colors, np.float32)
    w2c = np.asarray(cam.w2c)
    for _ in range(max_rounds):
        pc = verts @ w2c[:3, :3].T + w2c[:3, 3]
        z = pc[:, 2]
        zs = np.where(np.abs(z) < 1e-8, 1e-8, z)
        u = pc[:, 0] / zs * float(cam.fx) + cam.W / 2.0
        v = pc[:, 1] / zs * float(cam.fy) + cam.H / 2.0
        # clamp to a margin around the image so off-screen geometry
        # doesn't drive unbounded subdivision
        u = np.clip(u, -cam.W, 2 * cam.W)
        v = np.clip(v, -cam.H, 2 * cam.H)
        uv = np.stack([u, v], -1)
        tri_uv = uv[faces]
        vis = (z[faces] > _NEAR).all(-1)
        ext = (tri_uv.max(1) - tri_uv.min(1)).max(-1)
        big = vis & (ext + 1.0 > budget)
        if not big.any():
            break
        fb = faces[big]
        nv = verts.shape[0]
        mids = []
        mcols = []
        for a, b in ((0, 1), (1, 2), (2, 0)):
            mids.append((verts[fb[:, a]] + verts[fb[:, b]]) * 0.5)
            mcols.append((colors[fb[:, a]] + colors[fb[:, b]]) * 0.5)
        verts = np.concatenate([verts] + mids)
        colors = np.concatenate([colors] + mcols)
        k = fb.shape[0]
        m01 = nv + np.arange(k)
        m12 = nv + k + np.arange(k)
        m20 = nv + 2 * k + np.arange(k)
        new = np.concatenate([
            np.stack([fb[:, 0], m01, m20], -1),
            np.stack([fb[:, 1], m12, m01], -1),
            np.stack([fb[:, 2], m20, m12], -1),
            np.stack([m01, m12, m20], -1)])
        faces = np.concatenate([faces[~big], new])
    return verts, faces.astype(np.int64), colors


def _pad_pow2(verts, faces, colors):
    """Pad face/vertex counts to powers of two (degenerate all-zero
    faces) so the jitted _shade recompiles per size bucket, not per
    mesh."""
    import numpy as np
    fcap = max(1, 1 << int(np.ceil(np.log2(max(faces.shape[0], 1)))))
    vcap = max(1, 1 << int(np.ceil(np.log2(max(verts.shape[0], 1)))))
    if fcap > faces.shape[0]:
        faces = np.concatenate(
            [faces, np.zeros((fcap - faces.shape[0], 3), faces.dtype)])
    if vcap > verts.shape[0]:
        verts = np.concatenate(
            [verts, np.zeros((vcap - verts.shape[0], 3), verts.dtype)])
        colors = np.concatenate(
            [colors, np.zeros((vcap - colors.shape[0], colors.shape[1]),
                              colors.dtype)])
    return verts, faces, colors


def render_mesh(cam: Camera, verts, faces, vert_colors, bg=None,
                patch: int = 16, splits: int = 2, supersample: int = 1):
    """Vertex-color mesh render (reference mesh_renderer/__init__.py:67-130
    `render_mesh`): returns (rgb [H,W,3], depth [H,W], mask [H,W])."""
    verts, faces, vert_colors = _subdivide_to_budget(
        verts, faces, vert_colors, cam,
        budget=float(patch * splits) / max(int(supersample), 1))
    verts, faces, vert_colors = _pad_pow2(verts, faces, vert_colors)
    verts = jnp.asarray(verts, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    vert_colors = jnp.asarray(vert_colors, jnp.float32)
    if bg is None:
        bg = jnp.ones((3,), jnp.float32)  # reference default white
    bg = jnp.asarray(bg, jnp.float32)
    ss = int(supersample)
    import dataclasses
    rcam = cam if ss == 1 else dataclasses.replace(
        cam, H=cam.H * ss, W=cam.W * ss,
        fx=cam.fx * ss, fy=cam.fy * ss)
    img, depth, mask = _shade(rcam, verts, faces, vert_colors, bg,
                              rcam.H, rcam.W, patch, splits)
    if ss > 1:
        img = img.reshape(cam.H, ss, cam.W, ss, 3).mean((1, 3))
        mask = mask.reshape(cam.H, ss, cam.W, ss).mean((1, 3))
        # min-pool depth so silhouette pixels keep a foreground value
        d = depth.reshape(cam.H, ss, cam.W, ss)
        dv = jnp.where(d > 0, d, jnp.inf).min((1, 3))
        depth = jnp.where(jnp.isinf(dv), 0.0, dv)
    return img, depth, mask


def mesh_shape_render(cam: Camera, verts, faces, bg=None,
                      patch: int = 16, splits: int = 2,
                      supersample: int = 1):
    """Gray shaded "shape" render (reference mesh_shape_renderer,
    mesh_renderer/__init__.py:139-225: SoftPhong with a headlight).  Shades
    with flat per-face normals, light co-located with the camera."""
    verts = jnp.asarray(verts, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    va, vb, vc = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    fn = jnp.cross(vb - va, vc - va)
    fn = fn / jnp.maximum(jnp.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
    centroid = (va + vb + vc) / 3.0
    to_cam = cam.cam_center[None, :] - centroid
    to_cam = to_cam / jnp.maximum(
        jnp.linalg.norm(to_cam, axis=-1, keepdims=True), 1e-12)
    # double-sided headlight diffuse + ambient, like the gray Phong figure
    diff = jnp.abs(jnp.sum(fn * to_cam, axis=-1))
    shade = jnp.clip(0.3 + 0.7 * diff, 0.0, 1.0)
    # constant per-face color -> assign to vertices of a face-split mesh
    # (vertices shared across faces would blend shading; split for flatness)
    v_split = jnp.stack([va, vb, vc], 1).reshape(-1, 3)
    f_split = jnp.arange(faces.shape[0] * 3, dtype=jnp.int32).reshape(-1, 3)
    c_split = jnp.repeat(shade[:, None], 3, axis=0).reshape(-1, 1)
    c_split = jnp.concatenate([c_split] * 3, -1)
    return render_mesh(cam, v_split, f_split, c_split, bg=bg, patch=patch,
                       splits=splits, supersample=supersample)
