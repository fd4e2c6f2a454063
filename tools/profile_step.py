"""Component-level timing of the bench.py hot path on the real chip.

Times each stage of the training step in isolation (preprocess, binning,
pair gather, Pallas blend fwd, fwd+bwd, SSIM loss) so perf work targets
the actual bottleneck.  Run: python tools/profile_step.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from d2dgs_tpu.utils.cache import cache_dir  # noqa: E402 (pre-jax, no jax dep)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      cache_dir(os.path.join(os.path.dirname(__file__), "..",
                                             ".jax_cache")))

import jax
import jax.numpy as jnp
import numpy as np

from d2dgs_tpu.config import RasterConfig
from d2dgs_tpu.data.cameras import orbit_camera
from d2dgs_tpu.models.nodes import warp
from d2dgs_tpu.ops.binning import bin_gaussians
from d2dgs_tpu.ops.pallas.blend_tpu import (CHUNK, blend_tiles_pallas,
                                            blend_tiles_wq, build_gdata,
                                            build_work_queue)
from d2dgs_tpu.ops.projection import preprocess, tile_grid
from d2dgs_tpu.ops.ssim import l1, ssim
from d2dgs_tpu.render.renderer import render
from d2dgs_tpu.train.config import TrainConfig
from d2dgs_tpu.train.trainer import init_train_state

H = W = 800
N = 100_000


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / iters * 1e3
    print(f"{name:36s} {ms:9.2f} ms")
    return ms


def main():
    cfg = TrainConfig(gaussian_capacity=N, node_num=512,
                      raster=RasterConfig(tile_cap=2048, chunk=64, pair_cap=6144 * 128))
    rc = cfg.raster
    key = jax.random.PRNGKey(0)
    pts = np.asarray(jax.random.normal(key, (N, 3)) * 0.4)
    cols = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (N, 3)))
    state = init_train_state(key, cfg, pts, cols)
    # profile the converged-run workload when its export exists (same
    # sampling as bench.py), else the hand-set fallback
    import os
    dist = next((os.path.join(os.path.dirname(__file__), "..", f)
                 for f in ("CONVERGENCE_r04_dist.npz",
                           "CONVERGENCE_r03_dist.npz")
                 if os.path.exists(os.path.join(
                     os.path.dirname(__file__), "..", f))), None)
    if dist:
        with np.load(dist) as z:
            rows = np.random.RandomState(0).randint(
                0, z["scaling"].shape[0], size=N)
            gauss = dataclasses.replace(
                state.gauss, scaling=jnp.asarray(z["scaling"][rows]),
                opacity=jnp.asarray(z["opacity"][rows]))
        print(f"workload: {os.path.basename(dist)}")
    else:
        gauss = dataclasses.replace(
            state.gauss, scaling=jnp.full_like(state.gauss.scaling,
                                               np.log(8e-3)))
    cam = orbit_camera(0.3, 0.25, 4.0, fov=0.69, H=H, W=W, time=0.5)
    gt = jnp.zeros((H, W, 3), jnp.float32)
    bg = jnp.zeros((3,), jnp.float32)
    nodes = state.nodes
    gx, gy = tile_grid(H, W)
    num_tiles = gx * gy

    means = gauss.xyz
    scales = jnp.exp(gauss.scaling)
    quats = gauss.rotation / jnp.linalg.norm(gauss.rotation, axis=-1,
                                             keepdims=True)
    opac = jax.nn.sigmoid(gauss.opacity[:, 0])
    colors = jnp.abs(gauss.features_dc[:, 0])

    prep_fn = jax.jit(lambda m, s, q: preprocess(m, s, q, cam, 1.0))
    prep = prep_fn(means, scales, quats)
    timeit("preprocess fwd", prep_fn, means, scales, quats)

    # auto-size every static cap to the measured workload, exactly as
    # bench.py does (loose caps make every stage stream pad work)
    from d2dgs_tpu.ops.binning import required_emission
    need = int(required_emission(prep))
    rc = dataclasses.replace(rc, emission_cap=((need + 4095) // 4096) * 4096)
    binning0 = jax.jit(
        lambda p: bin_gaussians(p, gx, gy, rc, opacity=opac))(prep)
    counts0 = np.asarray(binning0.tile_count)
    ch = rc.chunk
    total_work = int(np.sum((counts0 + ch - 1) // ch))
    rc = dataclasses.replace(
        rc, pair_cap=(total_work + 16) * ch,
        tile_cap=((int(counts0.max()) + ch - 1) // ch + 1) * ch)
    cfg = dataclasses.replace(cfg, raster=rc)

    bin_fn = jax.jit(lambda p: bin_gaussians(p, gx, gy, rc, opacity=opac))
    binning = bin_fn(prep)
    print(f"  num_pairs={int(binning.num_pairs)} "
          f"max_tile_count={int(jnp.max(binning.tile_count))} "
          f"clamped={int(binning.clamped)}")
    timeit("binning (sort) fwd", bin_fn, prep)

    nfe = 18
    feats = jnp.concatenate([prep.T.reshape(N, 9), prep.center, prep.normal,
                             colors, opac[:, None]], axis=-1)
    assert feats.shape[-1] == nfe

    if not os.environ.get("SKIP_OLD"):
        gd_fn = jax.jit(lambda f, b: build_gdata(f, b, num_tiles, rc))
        gdata, counts = gd_fn(feats, binning)
        timeit("build_gdata (gather) fwd", gd_fn, feats, binning)

        blend_fn = jax.jit(lambda g, c: blend_tiles_pallas(
            g, c, num_tiles, gx, rc.tile_cap // 128))
        blend_fn(gdata, counts)
        timeit("pallas blend fwd", blend_fn, gdata, counts)

        def gd_blend_loss(f, b):
            g, c = build_gdata(f, b, num_tiles, rc)
            out = blend_tiles_pallas(g, c, num_tiles, gx,
                                     rc.tile_cap // 128)
            return jnp.sum(out[:, 4:7] ** 2)
        gdb = jax.jit(jax.grad(gd_blend_loss))
        gdb(feats, binning)
        timeit("gather+blend fwd+bwd", gdb, feats, binning)

    # --- work-queue variant ---
    w_cap = rc.pair_cap // rc.chunk
    wq_fn = jax.jit(lambda f, b: build_work_queue(f, b, num_tiles, rc))
    gwq, wt, first, last, ovf = wq_fn(feats, binning)
    print(f"  wq: w_cap={w_cap} overflow={int(ovf)}")
    timeit("build_work_queue (gather) fwd", wq_fn, feats, binning)

    wq_blend = jax.jit(lambda g, t, fi, la: blend_tiles_wq(
        g, t, t, fi, la, num_tiles, gx, w_cap))
    wq_blend(gwq, wt, first, last)
    timeit("wq blend fwd", wq_blend, gwq, wt, first, last)

    def wq_loss(f, b):
        g, t, fi, la, _ = build_work_queue(f, b, num_tiles, rc)
        out = blend_tiles_wq(g, t, t, fi, la, num_tiles, gx, w_cap)
        return jnp.sum(out[:, 4:7] ** 2)
    wqg = jax.jit(jax.grad(wq_loss))
    wqg(feats, binning)
    timeit("wq gather+blend fwd+bwd", wqg, feats, binning)

    # deformation warp fwd+bwd in isolation
    def warp_loss(g_xyz, mlp):
        nd = dataclasses.replace(nodes, mlp=mlp)
        d = warp(nd, cfg.node_cfg, g_xyz, cam.time, feature=gauss.feature,
                 motion_mask=gauss.motion_mask)
        return (jnp.sum(d["d_xyz"] ** 2) + jnp.sum(d["d_rotation"] ** 2)
                + jnp.sum(d["d_scaling"] ** 2))
    warp_g = jax.jit(jax.grad(warp_loss, argnums=(0, 1)))
    warp_g(gauss.xyz, nodes.mlp)
    timeit("warp fwd+bwd", warp_g, gauss.xyz, nodes.mlp)

    # render (no warp) + l1-only loss fwd+bwd: isolates the raster path
    def render_l1(g_xyz, g_scaling, g_rot, g_opac, g_fdc):
        g = dataclasses.replace(gauss, xyz=g_xyz, scaling=g_scaling,
                                rotation=g_rot, opacity=g_opac,
                                features_dc=g_fdc)
        out = render(cam, g, bg, cfg=rc)
        return l1(out.image, gt) + 1e-3 * jnp.mean(out.rend_dist) \
            + 1e-3 * jnp.mean(out.rend_normal * out.surf_normal)
    rl1 = jax.jit(jax.grad(render_l1, argnums=(0, 1, 2, 3, 4)))
    rl1(gauss.xyz, gauss.scaling, gauss.rotation, gauss.opacity,
        gauss.features_dc)
    timeit("render+l1 (no warp/ssim) fwd+bwd", rl1, gauss.xyz,
           gauss.scaling, gauss.rotation, gauss.opacity, gauss.features_dc)

    ssim_fn = jax.jit(lambda a, b_: ssim(a, b_))
    ssim_fn(gt, gt)
    timeit("ssim fwd", ssim_fn, gt, gt)
    ssim_g = jax.jit(jax.grad(lambda a, b_: 1 - ssim(a, b_)))
    ssim_g(gt, gt)
    timeit("ssim fwd+bwd", ssim_g, gt, gt)

    def render_loss(g_xyz, g_scaling, g_rot, g_opac, g_fdc, mlp):
        g = dataclasses.replace(gauss, xyz=g_xyz, scaling=g_scaling,
                                rotation=g_rot, opacity=g_opac,
                                features_dc=g_fdc)
        nd = dataclasses.replace(nodes, mlp=mlp)
        d = warp(nd, cfg.node_cfg, g.xyz, cam.time, feature=g.feature,
                 motion_mask=g.motion_mask)
        out = render(cam, g, bg, d_xyz=d["d_xyz"],
                     d_rotation=d["d_rotation"], d_scaling=d["d_scaling"],
                     cfg=rc)
        return ((1.0 - cfg.lambda_dssim) * l1(out.image, gt)
                + cfg.lambda_dssim * (1.0 - ssim(out.image, gt)))

    full_fwd = jax.jit(render_loss)
    args = (gauss.xyz, gauss.scaling, gauss.rotation, gauss.opacity,
            gauss.features_dc, nodes.mlp)
    full_fwd(*args)
    timeit("FULL fwd (render+loss)", full_fwd, *args)

    t0 = time.time()
    full_g = jax.jit(jax.grad(render_loss, argnums=(0, 1, 2, 3, 4, 5)))
    g = full_g(*args)
    jax.block_until_ready(g)
    print(f"full fwd+bwd compile: {time.time() - t0:.1f} s")
    ms = timeit("FULL fwd+bwd (bench workload)", full_g, *args)
    print(f"=> {H * W / (ms / 1e3) / 1e6:.2f} M rays/s")


if __name__ == "__main__":
    main()
