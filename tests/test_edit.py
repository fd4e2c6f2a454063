"""Interactive-editing stack: ARAP deformer, LapDeform facade, keypoints,
rotmat<->quat."""
import numpy as np
import jax.numpy as jnp


def _grid_cloud(n=5, spacing=0.2):
    g = np.arange(n) * spacing
    pts = np.stack(np.meshgrid(g, g, [0.0], indexing="ij"), -1)
    return pts.reshape(-1, 3).astype(np.float32)


def test_rotmat_quat_roundtrip():
    from d2dgs_tpu.utils.quaternion import quat_to_rotmat, rotmat_to_quat
    rng = np.random.RandomState(0)
    q = rng.randn(32, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    # force positive w (standardized form)
    q[q[:, 0] < 0] *= -1
    R = quat_to_rotmat(jnp.asarray(q))
    q2 = np.asarray(rotmat_to_quat(R))
    np.testing.assert_allclose(q2, q, atol=1e-4)


def test_arap_rigid_translation_is_exact():
    """Translating all handles rigidly should translate the whole cloud."""
    from d2dgs_tpu.edit import LapDeform
    pcl = _grid_cloud()
    lap = LapDeform(pcl, K=4)
    handle_idx = np.array([0, 4, 20, 24])  # corners of the grid
    delta = np.array([0.3, -0.1, 0.2], np.float32)
    new, quats = lap.deform_arap(handle_idx, pcl[handle_idx] + delta)
    new = np.asarray(new)
    np.testing.assert_allclose(new, pcl + delta, atol=1e-3)
    # rotations are identity -> quats ~ [1,0,0,0]
    np.testing.assert_allclose(np.asarray(quats)[:, 0], 1.0, atol=1e-3)


def test_arap_handles_pinned_and_rigidity():
    from d2dgs_tpu.edit import LapDeform
    pcl = _grid_cloud()
    lap = LapDeform(pcl, K=4)
    handle_idx = np.array([0, 24])
    target = pcl[handle_idx].copy()
    target[1] += np.array([0.0, 0.0, 0.4], np.float32)  # lift one corner
    new, _ = lap.deform_arap(handle_idx, target)
    new = np.asarray(new)
    np.testing.assert_allclose(new[handle_idx], target, atol=1e-5)
    # interior deforms smoothly: bounded displacement, no NaNs
    assert np.isfinite(new).all()
    d = np.linalg.norm(new - pcl, axis=-1)
    assert d.max() <= 0.4 + 1e-3
    # ARAP energy of the solution is below that of naive (un-deformed
    # except handles) configuration
    naive = pcl.copy()
    naive[handle_idx] = target
    e_arap = float(lap.energy_arap(new))
    e_naive = float(lap.energy_arap(naive))
    assert e_arap < e_naive


def test_lap_deform_laplacian_editing():
    from d2dgs_tpu.edit import LapDeform
    pcl = _grid_cloud()
    lap = LapDeform(pcl, K=4)
    handle_idx = np.array([12])  # center
    new = np.asarray(lap.deform(handle_idx,
                                pcl[handle_idx] + [0, 0, 0.2]))
    assert abs(new[12, 2] - 0.2) < 1e-5
    assert np.isfinite(new).all()


def test_point_mask_and_rings():
    from d2dgs_tpu.edit import LapDeform
    pcl = _grid_cloud()
    mask = np.zeros(len(pcl), bool)
    mask[:15] = True
    lap = LapDeform(pcl, K=3, point_mask=mask)
    assert lap.N == 15
    ring = lap.add_one_ring_nbs([0])
    assert len(ring) > 1
    # world index 3 maps into the masked graph
    assert lap.world_2_local_index([3])[0] == 3


def test_deform_keypoints():
    from d2dgs_tpu.edit import DeformKeypoints
    pcl = _grid_cloud()
    kp = DeformKeypoints()
    kp.add_kpts(pcl, [1, 5, 7], expand=True)
    assert len(kp) == 3
    kp.add_kpts(pcl, [5])  # duplicate ignored
    assert len(kp) == 3
    kp.update_kpts([0.1, 0.0, 0.0])
    idx, pos = kp.get_kpts()
    np.testing.assert_allclose(pos[0], pcl[1] + [0.1, 0, 0], atol=1e-6)
    kp.delete_kpts([5])
    assert len(kp) == 2
