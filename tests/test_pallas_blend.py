"""Pallas blend kernel vs the pure-XLA oracle (interpret mode on CPU).

Covers BASELINE parity criteria: forward image/allmap equality and
pixel->parameter gradients through the full tiled pipeline.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d2dgs_tpu.config import RasterConfig
from d2dgs_tpu.data.cameras import orbit_camera
from d2dgs_tpu.ops.tiled_raster import rasterize_tiled

H, W = 48, 64
N = 160


def _scene(seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 5)
    means = jax.random.normal(ks[0], (N, 3)) * 0.5
    scales = jnp.exp(jax.random.normal(ks[1], (N, 2)) * 0.3) * 0.08
    quats = jax.random.normal(ks[2], (N, 4)) + jnp.array([1., 0, 0, 0])
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    opac = jax.nn.sigmoid(jax.random.normal(ks[3], (N,)) + 1.0)
    colors = jax.random.uniform(ks[4], (N, 3))
    cam = orbit_camera(0.4, 0.3, 3.0, fov=0.8, H=H, W=W, time=0.0)
    return means, scales, quats, opac, colors, cam


def _cfg(**kw):
    base = dict(tile_cap=256, chunk=64, pair_cap=4096)
    base.update(kw)
    return RasterConfig(**base)


# both Pallas variants: the dense (tile, chunk) grid kernel and the
# work-queue kernel (one grid step per actual chunk)
WQ = [False, True]


@pytest.fixture(scope="module")
def scene():
    return _scene()


@pytest.mark.parametrize("wq", WQ)
def test_forward_parity(scene, wq):
    means, scales, quats, opac, colors, cam = scene
    bg = jnp.array([0.2, 0.1, 0.4])
    cx, ax, *_ = rasterize_tiled(means, scales, quats, opac, colors, cam,
                                 bg, cfg=_cfg(use_pallas=False))
    cp, ap, *_ = rasterize_tiled(
        means, scales, quats, opac, colors, cam, bg,
        cfg=_cfg(use_pallas=True, pallas_interpret=True, use_workqueue=wq))
    np.testing.assert_allclose(np.asarray(cp), np.asarray(cx),
                               rtol=1e-5, atol=1e-5)
    # allmap: depth-acc, alpha, normal, median depth, distortion, med weight
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ax),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("wq", WQ)
def test_gradient_parity(scene, wq):
    means, scales, quats, opac, colors, cam = scene
    bg = jnp.array([0.0, 0.0, 0.0])
    tgt = jnp.linspace(0, 1, H * W * 3).reshape(H, W, 3)
    # weights touch every allmap channel so every VJP branch is exercised
    wch = jnp.array([1.0, 0.5, 0.3, 0.3, 0.3, 0.7, 0.2, 0.1])

    def loss(params, cfg):
        m, s, q, o, c = params
        color, allmap, *_ = rasterize_tiled(m, s, q, o, c, cam, bg, cfg=cfg)
        return (jnp.sum((color - tgt) ** 2)
                + jnp.sum(allmap * wch) * 1e-2)

    params = (means, scales, quats, opac, colors)
    gx = jax.grad(loss)(params, _cfg(use_pallas=False))
    gp = jax.grad(loss)(params, _cfg(use_pallas=True, pallas_interpret=True,
                                     use_workqueue=wq))
    for a, b, name in zip(gp, gx, "msqoc"):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, rtol=2e-4,
                                   atol=2e-5, err_msg=f"grad {name}")


@pytest.mark.parametrize("wq", WQ)
def test_early_termination_and_overflow(scene, wq):
    """Opaque stacked splats: early-exit path; tiny cap: overflow path."""
    means, scales, quats, opac, colors, cam = scene
    opac = jnp.ones_like(opac) * 0.999    # saturate T quickly
    bg = jnp.array([1.0, 1.0, 1.0])
    cx, ax, *_ = rasterize_tiled(means, scales, quats, opac, colors, cam,
                                 bg, cfg=_cfg(use_pallas=False, tile_cap=128))
    cp, ap, *_ = rasterize_tiled(
        means, scales, quats, opac, colors, cam, bg,
        cfg=_cfg(use_pallas=True, pallas_interpret=True, tile_cap=128,
                 use_workqueue=wq))
    np.testing.assert_allclose(np.asarray(cp), np.asarray(cx),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ax),
                               rtol=1e-4, atol=1e-5)


def test_workqueue_overflow_grad_consistency():
    """pair_cap overflow must TRUNCATE cleanly, not corrupt gradients.

    Regression for the uninitialized-VMEM backward bug: when total work
    exceeds pair_cap, the truncated tile's final in-cap work item must
    carry last=1 so the reverse walk seeds its gradient scratch.  The
    truncated run must match an untruncated run on the same scene with
    per-tile counts pre-clamped to the in-cap prefix."""
    from d2dgs_tpu.ops.binning import bin_gaussians
    from d2dgs_tpu.ops.pallas.blend_tpu import (NFEAT, blend_tiles_wq,
                                                build_work_queue)
    from d2dgs_tpu.ops.projection import preprocess, tile_grid

    means, scales, quats, opac, colors, cam = _scene()
    gx, gy = tile_grid(H, W)
    num_tiles = gx * gy
    prep = preprocess(means, scales, quats, cam, 1.0)
    cfg_small = _cfg(use_pallas=True, pallas_interpret=True,
                     use_workqueue=True, pair_cap=384)    # w_cap = 6
    cfg_big = _cfg(use_pallas=True, pallas_interpret=True,
                   use_workqueue=True, pair_cap=4096)
    binning = bin_gaussians(prep, gx, gy, cfg_small)

    ch = cfg_small.chunk
    w_cap = cfg_small.pair_cap // ch
    counts = np.minimum(np.asarray(binning.tile_count), cfg_small.tile_cap)
    nch = (counts + ch - 1) // ch
    start = np.concatenate([[0], np.cumsum(nch)])
    assert start[-1] > w_cap, "scene must overflow the small pair_cap"
    in_cap = np.clip(np.minimum(start[1:], w_cap) - start[:-1], 0, None)
    counts_clamped = np.where(in_cap < nch, in_cap * ch, counts)
    bin_clamped = binning._replace(
        tile_count=jnp.asarray(counts_clamped, jnp.int32))

    feats0 = jnp.concatenate(
        [prep.T.reshape(N, 9), prep.center, prep.normal, colors,
         jnp.where(prep.valid, opac, 0.0)[:, None]], axis=-1)
    assert feats0.shape[-1] == NFEAT
    wch = jnp.linspace(0.1, 1.0, 14)

    def loss(feats, binn, cfg):
        g, wt, fi, la, ov = build_work_queue(feats, binn, num_tiles, cfg)
        out = blend_tiles_wq(g, wt, wt, fi, la, num_tiles, gx,
                             cfg.pair_cap // cfg.chunk)
        return jnp.sum(out[:, :14] * wch[None, :, None]), ov

    (lt, ovt), gt = jax.value_and_grad(loss, has_aux=True)(
        feats0, binning, cfg_small)
    (lc, ovc), gc = jax.value_and_grad(loss, has_aux=True)(
        feats0, bin_clamped, cfg_big)
    assert int(ovt) > 0 and int(ovc) == 0
    np.testing.assert_allclose(float(lt), float(lc), rtol=1e-6)
    scale = np.abs(np.asarray(gc)).max() + 1e-8
    np.testing.assert_allclose(np.asarray(gt) / scale,
                               np.asarray(gc) / scale, rtol=1e-5, atol=1e-6)
    assert np.isfinite(np.asarray(gt)).all()


def test_workqueue_empty_scene():
    """All Gaussians culled: every tile must render exactly background."""
    means, scales, quats, opac, colors, cam = _scene()
    means = means + jnp.array([0.0, 0.0, 100.0])   # far behind the camera
    bg = jnp.array([0.3, 0.6, 0.9])
    c, a, *_ = rasterize_tiled(
        means, scales, quats, opac, colors, cam, bg,
        cfg=_cfg(use_pallas=True, pallas_interpret=True, use_workqueue=True))
    np.testing.assert_allclose(np.asarray(c),
                               np.broadcast_to(np.asarray(bg), (H, W, 3)),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a[..., 1]), 0.0, atol=1e-6)


def test_chunk_bwd_matches_autodiff():
    """Hand-derived _chunk_bwd == jax.vjp(_chunk_step) on edge cases:
    saturated opacity (early termination), done pixels, tiny carry T."""
    from d2dgs_tpu.ops.pallas.blend_tpu import (NCARRY, NFEAT, NSTATE, PIX,
                                                ROW_DONE, _chunk_bwd,
                                                _chunk_step)

    G = 32
    cases = [dict(), dict(opac_scale=3.0), dict(done_frac=0.5),
             dict(t_in_small=True), dict(opac_scale=3.0, done_frac=0.3)]
    for i, kw in enumerate(cases):
        ks = jax.random.split(jax.random.PRNGKey(10 + i), 8)
        feats = jax.random.normal(ks[0], (G, NFEAT)) * 0.5
        feats = feats.at[:, 17].set(
            jax.nn.sigmoid(jax.random.normal(ks[1], (G,)) * 2)
            * kw.get("opac_scale", 1.0))
        feats = feats.at[:, 8].set(jnp.abs(feats[:, 8]) + 0.5)
        px = jax.random.uniform(ks[2], (1, PIX)) * 16
        py = jax.random.uniform(ks[3], (1, PIX)) * 16
        st = jnp.zeros((NSTATE, PIX))
        T0 = (jax.random.uniform(ks[4], (PIX,)) * 2e-4
              if kw.get("t_in_small")
              else jax.random.uniform(ks[4], (PIX,)) * 0.9 + 0.1)
        st = st.at[0].set(T0)
        st = st.at[1].set(
            (jax.random.uniform(ks[5], (PIX,))
             < kw.get("done_frac", 0.0)).astype(jnp.float32))
        st = st.at[2].set(jax.random.normal(ks[6], (PIX,)) * 0.1)
        st = st.at[3].set(jnp.abs(jax.random.normal(ks[7], (PIX,))) * 0.1)
        gst = jax.random.normal(jax.random.fold_in(ks[0], 99),
                                (NSTATE, PIX))
        gst = gst.at[ROW_DONE].set(0.0).at[14:].set(0.0)

        _, vjp = jax.vjp(lambda s, fe: _chunk_step(s, fe, px, py), st, feats)
        g_st, g_feats = vjp(gst)
        g_st = g_st.at[ROW_DONE].set(0.0)
        g_st2, g_feats2 = _chunk_bwd(st[:NCARRY], feats, px, py, gst)
        for name, a, b in [("gst", g_st, g_st2),
                           ("gfeats", g_feats, g_feats2)]:
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(a / scale, b / scale, rtol=5e-5,
                                       atol=5e-6,
                                       err_msg=f"case {i} {kw} {name}")
