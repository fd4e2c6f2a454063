"""C++ host-runtime library (native/mesh_post.cpp) vs numpy fallbacks."""
import numpy as np
import pytest

from d2dgs_tpu import native


def _soup():
    # quad (2 tris sharing an edge) + far isolated triangle
    return np.array([
        [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
        [[1, 0, 0], [1, 1, 0], [0, 1, 0]],
        [[10, 10, 10], [11, 10, 10], [10, 11, 10]],
    ], np.float32)


def test_weld_native_matches_fallback():
    tris = _soup()
    v_n, f_n = native.weld_mesh(tris, 1e-4)
    v_f, f_f = native._weld_mesh_np(tris, 1e-4)
    assert v_n.shape == v_f.shape == (7, 3)
    assert f_n.shape == f_f.shape == (3, 3)
    # same geometry regardless of vertex ordering
    assert np.allclose(np.sort(v_n.sum(1)), np.sort(v_f.sum(1)), atol=1e-5)
    # faces reference identical positions
    tri_n = np.sort(v_n[f_n].reshape(3, -1).sum(1))
    tri_f = np.sort(v_f[f_f].reshape(3, -1).sum(1))
    assert np.allclose(tri_n, tri_f, atol=1e-4)


def test_weld_merges_duplicates():
    tris = _soup()
    jitter = tris + np.random.RandomState(0).randn(*tris.shape) * 1e-7
    v, f = native.weld_mesh(np.concatenate([tris, jitter]), 1e-4)
    assert v.shape[0] == 7  # duplicates merged
    assert f.shape[0] == 6


def test_connected_components_and_filter():
    v, f = native.weld_mesh(_soup(), 1e-4)
    labels = native.connected_components(f, v.shape[0])
    assert len(set(labels.tolist())) == 2
    v2, f2 = native.filter_components(v, f, keep=1)
    assert f2.shape[0] == 2 and v2.shape[0] == 4
    # min_ratio keeps both clusters (sizes 2 and 1, ratio 0.4)
    v3, f3 = native.filter_components(v, f, keep=1, min_ratio=0.4)
    assert f3.shape[0] == 3
    # fallback parity
    v4, f4 = native._filter_components_np(v, f, 1, 0.0)
    assert f4.shape == f2.shape and v4.shape == v2.shape


def test_filter_empty():
    v = np.zeros((0, 3), np.float32)
    f = np.zeros((0, 3), np.int32)
    v2, f2 = native.filter_components(v, f)
    assert v2.shape[0] == 0 and f2.shape[0] == 0


@pytest.mark.skipif(not native.available(),
                    reason="C++ toolchain unavailable")
def test_native_library_loaded():
    assert native.available()
