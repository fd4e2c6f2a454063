"""Hash-grid deformation field (models/hash_deform.py) vs the reference
HashDeformNetwork semantics (utils/time_utils.py:517-767)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from d2dgs_tpu.models.deform import DeformConfig, apply_deform_field, \
    init_deform
from d2dgs_tpu.models.hash_deform import (HashConfig, hash_deform_forward,
                                          hash_encode, init_hash_deform)

TINY = HashConfig(n_levels=4, log2_hashmap_size=10, base_resolution=4,
                  start_level=2, start_step=0, update_steps=10,
                  num_layers=1, hidden=32, head_width=16)


def test_encode_trilinear_within_cell():
    """Along an axis-aligned segment inside one cell the encoding is
    linear: midpoint value = average of endpoints."""
    cfg = HashConfig(n_levels=1, log2_hashmap_size=12, base_resolution=4,
                     start_level=1, update_steps=1)
    params = init_hash_deform(jax.random.PRNGKey(0), cfg)
    tables = [t * 1e4 for t in params["tables"]]   # O(1) values
    a = jnp.array([[0.05, 0.10, 0.20]])
    b = jnp.array([[0.20, 0.10, 0.20]])            # same cell at res 4
    mid = (a + b) / 2
    ea = hash_encode(tables, cfg, a, step=10**9)
    eb = hash_encode(tables, cfg, b, step=10**9)
    em = hash_encode(tables, cfg, mid, step=10**9)
    np.testing.assert_allclose(np.asarray(em), np.asarray((ea + eb) / 2),
                               rtol=1e-5, atol=1e-6)


def test_progressive_cosine_mask():
    params = init_hash_deform(jax.random.PRNGKey(0), TINY)
    tables = [t * 1e4 for t in params["tables"]]
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3))
    e0 = np.asarray(hash_encode(tables, TINY, x, step=0))
    efull = np.asarray(hash_encode(tables, TINY, x, step=10**9))
    s = TINY.start_level * TINY.n_features
    # step 0: bands above start_level fully masked
    assert np.abs(e0[:, s:]).max() == 0.0
    assert np.abs(e0[:, :s]).max() > 0.0
    # fully annealed: everything passes
    assert np.abs(efull[:, s:]).max() > 0.0
    # monotone ramp in between
    emid = np.asarray(hash_encode(tables, TINY, x,
                                  step=TINY.n_masking_step // 2))
    assert np.abs(emid[:, s:]).sum() <= np.abs(efull[:, s:]).sum() + 1e-6


def test_forward_shapes_and_identity_start():
    params = init_hash_deform(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
    d = hash_deform_forward(params, TINY, x, 0.3)
    assert d["d_xyz"].shape == (32, 3)
    assert d["d_rotation"].shape == (32, 4)
    assert d["d_scaling"].shape == (32, 2)
    # near-zero main-MLP output layer => tiny initial deformation
    assert float(jnp.abs(d["d_xyz"]).max()) < 0.1


def test_facade_dispatch():
    cfg = DeformConfig(deform_type="hash", hash=TINY)
    params = init_deform(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
    d = apply_deform_field(params, cfg, x, 0.5, step=100)
    assert d["d_xyz"].shape == (16, 3) and d["d_opacity"] is None


def test_hash_field_fits_translation():
    """The field must be able to learn a simple time-linear translation."""
    cfg = TINY
    params = init_hash_deform(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(2)
    x = jax.random.uniform(key, (256, 3), minval=-1.0, maxval=1.0)
    v = jnp.array([0.3, -0.2, 0.1])

    def loss_fn(p, t):
        d = hash_deform_forward(p, cfg, x, t, step=10**9)
        return jnp.mean((d["d_xyz"] - t * v[None, :]) ** 2)

    import optax
    opt = optax.adam(3e-3)
    ost = opt.init(params)

    @jax.jit
    def step(p, o, t):
        l, g = jax.value_and_grad(loss_fn)(p, t)
        up, o = opt.update(g, o)
        return optax.apply_updates(p, up), o, l

    ts = np.linspace(0, 1, 8)
    l0 = float(loss_fn(params, 0.7))
    for i in range(400):
        params, ost, l = step(params, ost, float(ts[i % 8]))
    l1 = float(loss_fn(params, 0.7))
    assert l1 < l0 * 0.05, (l0, l1)
