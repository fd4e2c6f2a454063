"""LPIPS weight-export recipe (tools/export_lpips_weights.py) + loader:
a torch state_dict with the reference lpipsPyTorch layout converts to the
npz that eval/metrics.py consumes, and `lpips_vgg` appears in metric
output ONLY when real weights load (never the random substitute)."""
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")

from d2dgs_tpu.eval.metrics import (Lpips, evaluate_image_metrics,
                                    get_lpips)

_VGG_CH = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
           (256, 256), (256, 256), (256, 512), (512, 512), (512, 512),
           (512, 512), (512, 512), (512, 512)]
_TAPS = [64, 128, 256, 512, 512]


def _fixture_npz(tmp_path, seed=0):
    rng = np.random.RandomState(seed)
    z = {}
    for i, (cin, cout) in enumerate(_VGG_CH):
        z[f"conv{i}_w"] = rng.randn(cout, cin, 3, 3).astype(np.float32) * .05
        z[f"conv{i}_b"] = np.zeros(cout, np.float32)
    for j, t in enumerate(_TAPS):
        z[f"lin{j}_w"] = rng.rand(t).astype(np.float32)
    path = str(tmp_path / "lpips_fixture.npz")
    np.savez(path, **z)
    return path


def test_lpips_loader_and_labeling(tmp_path):
    path = _fixture_npz(tmp_path)
    lp = get_lpips(path)
    assert lp is not None
    a = jnp.asarray(np.random.RandomState(1).rand(16, 16, 3), jnp.float32)
    b = jnp.asarray(np.random.RandomState(2).rand(16, 16, 3), jnp.float32)
    d_ab = float(lp(a, b))
    assert d_ab > 0 and np.isfinite(d_ab)
    assert float(lp(a, a)) < 1e-6
    m = evaluate_image_metrics(a, b, lpips_weights=path)
    assert "lpips_vgg" in m and "lpips_rand" in m
    m2 = evaluate_image_metrics(a, b)
    assert "lpips_vgg" not in m2          # never silently substituted


def test_export_tool_checkpoint_conversion(tmp_path):
    torch = pytest.importorskip("torch")
    from export_lpips_weights import _from_checkpoint

    rng = np.random.RandomState(3)
    sd = {}
    for i, (cin, cout) in enumerate(_VGG_CH):
        sd[f"net.features.{2 * i}.weight"] = torch.from_numpy(
            rng.randn(cout, cin, 3, 3).astype(np.float32))
        sd[f"net.features.{2 * i}.bias"] = torch.from_numpy(
            rng.randn(cout).astype(np.float32))
    for j, t in enumerate(_TAPS):
        sd[f"lins.{j}.model.1.weight"] = torch.from_numpy(
            rng.rand(1, t, 1, 1).astype(np.float32))
    ckpt = str(tmp_path / "lpips.pth")
    torch.save(sd, ckpt)
    weights = _from_checkpoint(ckpt)
    out = str(tmp_path / "lpips.npz")
    np.savez(out, **weights)
    lp = Lpips(out)
    np.testing.assert_allclose(
        np.asarray(lp.lins[2]),
        sd["lins.2.model.1.weight"].numpy().reshape(-1))
    np.testing.assert_allclose(
        np.asarray(lp.convs[5][0]),
        sd["net.features.10.weight"].numpy())
