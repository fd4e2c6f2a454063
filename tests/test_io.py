"""PLY round-trip + full TrainState checkpoint round-trip."""
import jax
import numpy as np

from d2dgs_tpu.io import (load_gaussian_ply, load_train_state,
                          save_gaussian_ply, save_train_state)
from d2dgs_tpu.models.gaussians import create_from_pcd


def _params(n=17, cap=32, sh=2, fea=3):
    rng = np.random.RandomState(0)
    p = create_from_pcd(rng.randn(n, 3).astype(np.float32),
                        rng.rand(n, 3).astype(np.float32), cap,
                        sh_degree=sh, fea_dim=fea, with_motion_mask=True)
    # randomize everything so the round-trip is meaningful
    import dataclasses
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    shape = {f: getattr(p, f).shape for f in
             ("features_rest", "rotation", "opacity", "feature")}
    return dataclasses.replace(
        p,
        features_rest=jax.random.normal(ks[0], shape["features_rest"]),
        rotation=jax.random.normal(ks[1], shape["rotation"]),
        opacity=jax.random.normal(ks[2], shape["opacity"]),
        feature=jax.random.normal(ks[3], shape["feature"]))


def test_ply_roundtrip(tmp_path):
    p = _params()
    path = str(tmp_path / "point_cloud.ply")
    save_gaussian_ply(path, p)
    q = load_gaussian_ply(path, capacity=32, sh_degree=2, fea_dim=3,
                          with_motion_mask=True)
    n = int(np.sum(np.asarray(p.alive)))
    assert int(np.sum(np.asarray(q.alive))) == n
    for f in ("xyz", "features_dc", "features_rest", "scaling", "rotation",
              "opacity", "feature"):
        np.testing.assert_allclose(np.asarray(getattr(q, f))[:n],
                                   np.asarray(getattr(p, f))[:n],
                                   rtol=1e-6, err_msg=f)


def test_checkpoint_roundtrip(tmp_path):
    from d2dgs_tpu.config import RasterConfig
    from d2dgs_tpu.train.config import TrainConfig
    from d2dgs_tpu.train.trainer import init_train_state

    cfg = TrainConfig(sh_degree=1, hyper_dim=2, node_num=8,
                      gaussian_capacity=64, node_gauss_capacity=32,
                      raster=RasterConfig(tile_cap=64, chunk=32))
    rng = np.random.RandomState(0)
    state = init_train_state(jax.random.PRNGKey(0), cfg,
                             rng.randn(32, 3).astype(np.float32),
                             rng.rand(32, 3).astype(np.float32))
    path = str(tmp_path / "ckpt.npz")
    save_train_state(path, state, iteration=123, iteration_node=45)

    template = init_train_state(jax.random.PRNGKey(7), cfg,
                                rng.randn(32, 3).astype(np.float32),
                                rng.rand(32, 3).astype(np.float32))
    loaded, it, it_node = load_train_state(path, template)
    assert (it, it_node) == (123, 45)
    for a, b in zip(jax.tree_util.tree_leaves(loaded),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7)

    # checkpoints are path-keyed (format 2): a layout drift between save
    # and load must fail loudly by NAME, never silently mis-assign
    # (ADVICE r4: the positional format mis-indexed across the
    # active_sh_degree meta->data move)
    with np.load(path) as z:
        assert int(z["__format__"]) == 2
        assert any(k.startswith("leaf:") for k in z.files)

    # legacy positional checkpoints with a different leaf count get a
    # clear "incompatible checkpoint format" error, not a shape assert
    import pytest
    leaves = jax.tree_util.tree_leaves(state)
    legacy = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves[:-1])}
    legacy["__iteration__"] = np.asarray(1)
    legacy["__iteration_node__"] = np.asarray(0)
    legacy_path = str(tmp_path / "legacy.npz")
    np.savez(legacy_path, **legacy)
    with pytest.raises(ValueError, match="incompatible checkpoint format"):
        load_train_state(legacy_path, template)
