"""As-rigid-as-possible handle-based deformation for interactive editing.

The reference's ARAPDeformer (utils/arap_deform.py:98-171) runs the
Sorkine-Alexa local-global loop on the control-node point cloud: a KNN
graph with Gaussian edge weights, per-node rotation fitting via SVD
(local step), and a weighted-Laplacian linear solve with handle positions
pinned (global step, `lstsq_with_handles`, lap_deform.py:227).

TPU-native design: the editing graph is control-node scale (M ~ 512-1024),
so the Laplacian is kept DENSE — the global step is a batched
`jnp.linalg.solve` that maps straight onto the MXU, and the whole
`arap_deform` loop jits as one XLA program (static K, fixed iteration
count, handle pinning via row masking instead of index surgery).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.knn import knn
from ..utils.quaternion import rotmat_to_quat


class ArapGraph(NamedTuple):
    verts: jnp.ndarray    # [N,3] rest positions
    nbr: jnp.ndarray      # [N,K] neighbor indices
    w: jnp.ndarray        # [N,K] normalized edge weights
    L: jnp.ndarray        # [N,N] weighted graph Laplacian


def build_graph(pcl: jnp.ndarray, K: int = 4,
                radius: float | None = None) -> ArapGraph:
    """KNN graph + Gaussian edge weights exp(-d^2 / (2 r^2)) normalized
    per-vertex (ARAPDeformer.__init__ / LapDeform.weight), and the dense
    weighted Laplacian L = D - W (symmetrized)."""
    pcl = jnp.asarray(pcl, jnp.float32)
    N = pcl.shape[0]
    d2, idx = knn(pcl, pcl, K, exclude_self=True)
    if radius is None:
        r2 = jnp.mean(d2) + 1e-12
    else:
        r2 = radius ** 2
    w = jnp.exp(-d2 / (2.0 * r2))
    w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-12)
    # Row-stochastic Laplacian L = I - W_row, consistent with the
    # row-normalized weights used for the global-step RHS (the
    # reference's L_opt); a symmetrized L would make rigid translation
    # not a fixed point of the local-global loop.
    W = jnp.zeros((N, N), jnp.float32)
    W = W.at[jnp.arange(N)[:, None], idx].add(w)
    L = jnp.diag(W.sum(-1)) - W
    return ArapGraph(verts=pcl, nbr=idx, w=w, L=L)


def _solve_with_handles(L, b, handle_mask, handle_pos):
    """Solve L x = b with rows of handle vertices replaced by x_h = p_h
    (the static-shape equivalent of lstsq_with_handles)."""
    N = L.shape[0]
    eye = jnp.eye(N, dtype=L.dtype)
    A = jnp.where(handle_mask[:, None], eye, L)
    rhs = jnp.where(handle_mask[:, None], handle_pos, b)
    return jnp.linalg.solve(A, rhs)


def _fit_rotations(P, P_prime, w):
    """Per-vertex SVD best-fit rotations of weighted edge sets
    (arap_deform.py:127-146 incl. the det<=0 column flip)."""
    S = jnp.einsum("nki,nk,nkj->nij", P, w, P_prime)
    # zero covariance (undeformed) -> identity rotation
    U, sig, Vt = jnp.linalg.svd(S)
    R = jnp.einsum("nji,nkj->nik", Vt, U)    # V @ U^T
    det = jnp.linalg.det(R)
    # flip the column of U with the smallest singular value where det<0
    flip_col = jnp.argmin(sig, axis=-1)
    sign = jnp.ones_like(sig).at[
        jnp.arange(sig.shape[0]), flip_col].set(jnp.where(det < 0, -1.0,
                                                          1.0))
    Umod = U * sign[:, None, :]
    Rfix = jnp.einsum("nji,nkj->nik", Vt, Umod)
    R = jnp.where((det < 0)[:, None, None], Rfix, R)
    undeformed = jnp.all(jnp.abs(P - P_prime) < 1e-12, axis=(1, 2))
    return jnp.where(undeformed[:, None, None],
                     jnp.eye(3, dtype=R.dtype)[None], R)


@partial(jax.jit, static_argnames=("n_iters", "return_quats"))
def arap_deform(graph: ArapGraph, handle_mask: jnp.ndarray,
                handle_pos: jnp.ndarray, n_iters: int = 3,
                return_quats: bool = True):
    """Deform graph.verts so vertices with handle_mask=True land at
    handle_pos (rows for non-handles ignored), preserving local rigidity.

    handle_mask: [N] bool; handle_pos: [N,3] (only masked rows used).
    Returns (new_verts [N,3], quats [N,4] or None).  Mirrors
    ARAPDeformer.deform (NUM_ITER=3 local-global rounds seeded by the
    Laplacian-editing solve L p' = L p)."""
    verts, nbr, w, L = graph
    P = verts[:, None, :] - verts[nbr]            # [N,K,3] rest edges
    p_prime = _solve_with_handles(L, L @ verts, handle_mask, handle_pos)
    R = jnp.broadcast_to(jnp.eye(3, dtype=verts.dtype),
                         (verts.shape[0], 3, 3))
    for _ in range(n_iters):
        P_prime = p_prime[:, None, :] - p_prime[nbr]
        R = _fit_rotations(P, P_prime, w)
        Rsum = R[:, None] + R[nbr]                # [N,K,3,3]
        b = 0.5 * jnp.einsum("nkij,nkj,nk->ni", Rsum, P, w)
        p_prime = _solve_with_handles(L, b, handle_mask, handle_pos)
    quats = rotmat_to_quat(R) if return_quats else None
    return p_prime, quats


@jax.jit
def deform_energy(graph: ArapGraph, pcl: jnp.ndarray,
                  prev_pcl: jnp.ndarray | None = None) -> jnp.ndarray:
    """ARAP energy of a deformed cloud w.r.t. the rest graph
    (LapDeform.energy_arap, lap_deform.py:191-199): rotation-invariant
    weighted edge-length residual after best-fit rotations."""
    verts, nbr, w, _ = graph
    rest = verts if prev_pcl is None else prev_pcl
    P = rest[:, None, :] - rest[nbr]
    P_prime = pcl[:, None, :] - pcl[nbr]
    R = _fit_rotations(P, P_prime, w)
    res = P_prime - jnp.einsum("nij,nkj->nki", R, P)
    return jnp.sum(w * jnp.sum(res * res, -1))
