"""GaussianParams state, renderer facade, densify/prune invariants."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from d2dgs_tpu.config import RasterConfig
from d2dgs_tpu.data import synthetic
from d2dgs_tpu.models import densify as D
from d2dgs_tpu.models.gaussians import GaussianParams, create_from_pcd
from d2dgs_tpu.render.renderer import render
from d2dgs_tpu.train.optim import adam_init, adam_update

CFG = RasterConfig(tile_cap=512, chunk=64)


def make_params(n=100, capacity=160, key=0):
    k = jax.random.PRNGKey(key)
    pts = np.asarray(jax.random.uniform(k, (n, 3), minval=-1, maxval=1))
    cols = np.asarray(jax.random.uniform(jax.random.PRNGKey(key + 1), (n, 3)))
    return create_from_pcd(pts, cols, capacity=capacity, sh_degree=3,
                           fea_dim=8)


def test_create_from_pcd_shapes():
    p = make_params()
    assert p.xyz.shape == (160, 3)
    assert p.features_rest.shape == (160, 15, 3)
    assert p.scaling.shape == (160, 2)
    assert p.feature.shape == (160, 9)  # 8 hyper + motion mask
    assert int(p.num_alive) == 100
    np.testing.assert_allclose(np.asarray(p.get_opacity[:100]), 0.1, atol=1e-6)
    assert float(jnp.max(jnp.abs(p.motion_mask[:100] - 0.5))) < 1e-6


def test_render_facade_runs_and_probe_grads():
    p = make_params()
    cam = synthetic.test_camera(H=48, W=48)
    bg = jnp.zeros(3)
    probe = jnp.zeros((p.capacity, 2))

    def loss_fn(probe):
        out = render(cam, p, bg, screen_probe=probe, cfg=CFG)
        return jnp.mean(out.image ** 2), out

    (val, out), g = jax.value_and_grad(loss_fn, has_aux=True)(probe)
    assert out.image.shape == (48, 48, 3)
    assert out.depth.shape == (48, 48, 1)
    assert bool(jnp.all(jnp.isfinite(g)))
    # visible gaussians should produce non-zero screen-space stats
    vis_g = jnp.linalg.norm(g, axis=-1)[out.visibility]
    assert float(jnp.max(vis_g)) > 0


def test_densify_clone_and_split_and_prune():
    p = make_params(n=50, capacity=200)
    trainable = dict(xyz=p.xyz, features_dc=p.features_dc,
                     features_rest=p.features_rest, scaling=p.scaling,
                     rotation=p.rotation, opacity=p.opacity,
                     feature=p.feature)
    opt = adam_init(trainable)
    mu, nu = opt.mu, opt.nu
    # poke non-zero moments so we can check zeroing at written slots
    mu = jax.tree.map(lambda x: x + 1.0, mu)

    stats = D.init_stats(200)
    # force first 10 to clone (small) and next 5 to split (big)
    grad = jnp.zeros(200).at[:15].set(1.0)
    stats = stats._replace(grad_accum=grad, denom=jnp.ones(200))
    scaling = p.scaling.at[:10].set(jnp.log(0.001))  # tiny -> clone
    scaling = scaling.at[10:15].set(jnp.log(0.5))    # big -> split
    p = dataclasses.replace(p, scaling=scaling)

    extent = 1.0
    new_p, mu2, nu2, stats2, info = D.densify_and_prune(
        p, mu, nu, stats, jax.random.PRNGKey(0), max_grad=0.5,
        min_opacity=0.005, extent=extent, prune_big_ws=False,
        percent_dense=0.01)
    assert int(info["clones"]) == 10
    assert int(info["splits"]) == 5
    # alive: 50 - 5 split originals + 10 clones + 10 children
    assert int(new_p.num_alive) == 50 - 5 + 10 + 10
    # clone destinations got zeroed moments
    written = np.asarray(new_p.alive & ~p.alive)
    assert np.asarray(mu2["xyz"])[written].max() == 0.0
    # children scale shrunk by 1.6
    assert int(stats2.denom.sum()) == 0


def test_densify_capacity_overflow_drops():
    p = make_params(n=50, capacity=55)
    trainable = dict(xyz=p.xyz, opacity=p.opacity, scaling=p.scaling,
                     rotation=p.rotation, feature=p.feature,
                     features_dc=p.features_dc,
                     features_rest=p.features_rest)
    opt = adam_init(trainable)
    stats = D.init_stats(55)._replace(
        grad_accum=jnp.ones(55), denom=jnp.ones(55))
    new_p, *_, info = D.densify_and_prune(
        p, opt.mu, opt.nu, stats, jax.random.PRNGKey(0), max_grad=0.5,
        min_opacity=0.005, extent=100.0, prune_big_ws=False)
    assert int(new_p.num_alive) <= 55
    assert int(info["overflow"]) > 0


def test_reset_opacity():
    p = make_params()
    trainable = dict(opacity=p.opacity)
    opt = adam_init(trainable)
    mu = jax.tree.map(lambda x: x + 3.0, opt.mu)
    p2, mu2, nu2 = D.reset_opacity(p, mu, opt.nu)
    assert float(jnp.max(p2.get_opacity[p2.alive])) <= 0.01 + 1e-6
    assert float(jnp.max(jnp.abs(mu2["opacity"]))) == 0.0


def test_adam_matches_torch_semantics():
    import torch
    x0 = np.random.RandomState(0).randn(5, 3).astype(np.float32)
    g = np.random.RandomState(1).randn(5, 3).astype(np.float32)

    xt = torch.tensor(x0, requires_grad=True)
    opt = torch.optim.Adam([xt], lr=0.01, eps=1e-15)
    for _ in range(3):
        xt.grad = torch.tensor(g)
        opt.step()

    params = {"x": jnp.asarray(x0)}
    st = adam_init(params)
    for _ in range(3):
        params, st = adam_update({"x": jnp.asarray(g)}, st, params,
                                 {"x": 0.01})
    np.testing.assert_allclose(np.asarray(params["x"]),
                               xt.detach().numpy(), atol=1e-6)
