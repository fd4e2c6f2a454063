"""ctypes bindings for the C++ host-runtime library (native/).

The reference's mesh finalization runs inside Open3D's C++ pipeline
(reference utils/mesh_utils.py:24-45); here the equivalent weld /
connected-components / cluster-filter loops live in native/mesh_post.cpp.
The library is built on demand with g++ (no pybind11 in this image — plain
C ABI via ctypes).  Every entry point has a pure-numpy fallback so the
framework works even without a C++ toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO = os.path.join(_NATIVE_DIR, "libd2dgs_native.so")
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # no toolchain / build failure -> fallback
            warnings.warn(f"d2dgs native build failed ({e}); "
                          "using numpy fallbacks")
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        warnings.warn(f"d2dgs native load failed ({e}); "
                      "using numpy fallbacks")
        return None

    i64, i32, f32, f64 = (ctypes.c_int64, ctypes.c_int32, ctypes.c_float,
                          ctypes.c_double)
    pf = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    pi = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    pu8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    pi64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

    lib.d2dgs_weld_mesh.restype = i64
    lib.d2dgs_weld_mesh.argtypes = [pf, i64, f64, pf, pi, pi64]
    lib.d2dgs_connected_components.restype = i32
    lib.d2dgs_connected_components.argtypes = [pi, i64, i32, pi]
    lib.d2dgs_filter_components.restype = i64
    lib.d2dgs_filter_components.argtypes = [
        pf, i32, pi, i64, i32, f64, pf, pi, pi64, pu8, pi]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def weld_mesh(tris: np.ndarray, cell: float):
    """Triangle soup [T,3,3] -> (verts [V,3], faces [F,3]).  Vertices
    within `cell` of each other merge (position = mean of members);
    degenerate faces are dropped."""
    tris = np.ascontiguousarray(tris, np.float32).reshape(-1, 3, 3)
    n_tris = tris.shape[0]
    if n_tris == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    lib = _load()
    if lib is None:
        return _weld_mesh_np(tris, cell)
    out_verts = np.empty((n_tris * 3, 3), np.float32)
    out_faces = np.empty((n_tris, 3), np.int32)
    n_faces = np.zeros(1, np.int64)
    n_verts = lib.d2dgs_weld_mesh(tris.reshape(-1), n_tris, cell,
                                  out_verts.reshape(-1),
                                  out_faces.reshape(-1), n_faces)
    return (out_verts[:n_verts].copy(), out_faces[:int(n_faces[0])].copy())


def filter_components(verts: np.ndarray, faces: np.ndarray, keep: int = 1,
                      min_ratio: float = 0.0):
    """Keep the `keep` largest edge-connected components (by face count),
    plus any with >= min_ratio * largest faces.  Returns compacted
    (verts, faces)."""
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    if faces.shape[0] == 0:
        return verts, faces
    lib = _load()
    if lib is None:
        return _filter_components_np(verts, faces, keep, min_ratio)
    out_verts = np.empty_like(verts)
    out_faces = np.empty_like(faces)
    n_faces = np.zeros(1, np.int64)
    mask = np.empty(faces.shape[0], np.uint8)
    new_index = np.empty(verts.shape[0], np.int32)
    n_verts = lib.d2dgs_filter_components(
        verts.reshape(-1), verts.shape[0], faces.reshape(-1),
        faces.shape[0], keep, min_ratio, out_verts.reshape(-1),
        out_faces.reshape(-1), n_faces, mask, new_index)
    return out_verts[:n_verts].copy(), out_faces[:int(n_faces[0])].copy()


def connected_components(faces: np.ndarray, n_verts: int) -> np.ndarray:
    """Per-vertex component labels (0..k-1)."""
    faces = np.ascontiguousarray(faces, np.int32)
    lib = _load()
    if lib is None:
        return _connected_components_np(faces, n_verts)
    labels = np.empty(n_verts, np.int32)
    lib.d2dgs_connected_components(faces.reshape(-1), faces.shape[0],
                                   n_verts, labels)
    return labels


# ---------------------------------------------------------------- fallbacks

def _weld_mesh_np(tris, cell):
    flat = tris.reshape(-1, 3)
    keys = np.round(flat / cell).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    verts = np.zeros((uniq.shape[0], 3), np.float64)
    np.add.at(verts, inv, flat)
    counts = np.bincount(inv, minlength=uniq.shape[0])[:, None]
    verts = (verts / counts).astype(np.float32)
    faces = inv.reshape(-1, 3).astype(np.int32)
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2]))
    return verts, faces[good]


def _connected_components_np(faces, n_verts):
    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components as cc
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                        faces[:, [0, 2]]])
    adj = sp.coo_matrix((np.ones(len(e)), (e[:, 0], e[:, 1])),
                        shape=(n_verts, n_verts))
    _, label = cc(adj, directed=False)
    return label.astype(np.int32)


def _filter_components_np(verts, faces, keep, min_ratio):
    label = _connected_components_np(faces, verts.shape[0])
    fl = label[faces[:, 0]]
    sizes = np.bincount(fl)
    order = np.argsort(sizes)[::-1]
    chosen = set(order[:keep].tolist())
    if min_ratio > 0:
        chosen |= set(np.where(sizes >= min_ratio * sizes.max())[0].tolist())
    mask = np.isin(fl, list(chosen))
    faces2 = faces[mask]
    used = np.unique(faces2)
    remap = -np.ones(verts.shape[0], np.int64)
    remap[used] = np.arange(len(used))
    return verts[used], remap[faces2].astype(np.int32)
