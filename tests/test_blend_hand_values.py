"""Hand-computed convention tests for the rasterizer (docs/PARITY.md).

Expected values are derived IN THE TESTS with independent numpy formulas
transcribed from the reference kernel spec (forward.cu / auxiliary.h) —
never by calling library code — so the dense oracle (which every other
renderer is compared against) is itself pinned to the written spec.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np

from d2dgs_tpu.data.cameras import Camera
from d2dgs_tpu.ops.dense_raster import rasterize_dense

H = W = 32
FX = FY = 40.0


def _identity_cam():
    return Camera(w2c=jnp.eye(4), cam_center=jnp.zeros(3),
                  fx=jnp.float32(FX), fy=jnp.float32(FY),
                  time=jnp.float32(0.0), H=H, W=W)


def _splat(z=2.0, x=0.0, y=0.0, s=0.5, opacity=0.8):
    """A camera-facing surfel: tangent axes = (x, y), normal = +z."""
    means = jnp.array([[x, y, z]])
    scales = jnp.array([[s, s]])
    quats = jnp.array([[1.0, 0, 0, 0]])
    return means, scales, quats, jnp.array([opacity])


def _hand_alpha(px, py, x, y, z, s, opacity):
    """Independent transcription of forward.cu:336-399 for an
    axis-aligned camera-facing surfel at (x, y, z), scale s.

    T rows: Tu = K[:,?]... For identity pose: WR = I, so
    T = K @ [[s,0,x],[0,s,y],[0,0,z]] with K = [[fx,0,cx],[0,fy,cy],[0,0,1]].
    """
    K = np.array([[FX, 0, W / 2], [0, FY, H / 2], [0, 0, 1.0]])
    S = np.array([[s, 0, x], [0, s, y], [0, 0, z]])
    T = K @ S                       # rows indexed [row, col]; Tu=T[0] etc
    Tu, Tv, Tw = T[0], T[1], T[2]
    k = px * Tw - Tu
    l = py * Tw - Tv
    p = np.cross(k, l)
    su, sv = p[0] / p[2], p[1] / p[2]
    rho3d = su * su + sv * sv
    cx2d = FX * x / z + W / 2       # low-pass center = projected mean
    cy2d = FY * y / z + H / 2
    rho2d = 2.0 * ((cx2d - px) ** 2 + (cy2d - py) ** 2)
    rho = min(rho3d, rho2d)
    depth = (su * Tw[0] + sv * Tw[1] + Tw[2]) if rho3d <= rho2d else z
    alpha = min(0.99, opacity * np.exp(-0.5 * rho))
    if p[2] == 0 or depth < 0.2 or alpha < 1.0 / 255.0:
        alpha = 0.0
    return alpha, depth


def test_single_splat_alpha():
    cam = _identity_cam()
    means, scales, quats, opac = _splat()
    colors = jnp.array([[1.0, 0.5, 0.25]])
    img, allmap, *_ = rasterize_dense(means, scales, quats, opac, colors,
                                      cam)
    img = np.asarray(img)
    for (iy, ix) in [(16, 16), (14, 18), (20, 12)]:
        a, _ = _hand_alpha(ix + 0.5, iy + 0.5, 0.0, 0.0, 2.0, 0.5, 0.8)
        np.testing.assert_allclose(img[iy, ix], a * np.array(
            [1.0, 0.5, 0.25]), rtol=2e-5, atol=1e-6,
            err_msg=f"pixel {(iy, ix)}")


def test_lowpass_branch():
    """A sub-pixel splat: rho2d (the 1/sqrt(2) screen filter) must govern
    the footprint, giving a multi-pixel response despite s ~ 0."""
    cam = _identity_cam()
    means, scales, quats, opac = _splat(s=1e-3, opacity=0.9)
    colors = jnp.ones((1, 3))
    img, *_ = rasterize_dense(means, scales, quats, opac, colors, cam)
    img = np.asarray(img)
    a_c, _ = _hand_alpha(16.5, 16.5, 0, 0, 2.0, 1e-3, 0.9)
    np.testing.assert_allclose(img[16, 16, 0], a_c, rtol=1e-4)
    a_n, _ = _hand_alpha(17.5, 16.5, 0, 0, 2.0, 1e-3, 0.9)
    assert a_n > 0.05                        # neighbor via low-pass only
    np.testing.assert_allclose(img[16, 17, 0], a_n, rtol=1e-4)


def test_alpha_cutoff_and_clip():
    cam = _identity_cam()
    # clip: opacity 1.0 => alpha capped at 0.99 at the center
    means, scales, quats, _ = _splat(opacity=1.0)
    img, *_ = rasterize_dense(means, scales, quats, jnp.array([1.0]),
                              jnp.ones((1, 3)), cam)
    np.testing.assert_allclose(float(img[16, 16, 0]), 0.99, rtol=1e-5)
    # cutoff: alpha below 1/255 contributes exactly nothing
    img2, *_ = rasterize_dense(means, scales, quats,
                               jnp.array([1.0 / 300.0]), jnp.ones((1, 3)),
                               cam)
    assert float(np.abs(np.asarray(img2)).max()) == 0.0


def test_near_plane_rule():
    """Intersection depth below NEAR_PLANE (0.2) is excluded even when
    the gaussian center is in front of the plane."""
    cam = _identity_cam()
    means, scales, quats, opac = _splat(z=0.15)
    img, *_ = rasterize_dense(means, scales, quats, opac,
                              jnp.ones((1, 3)), cam)
    assert float(np.abs(np.asarray(img)).max()) == 0.0
    means, scales, quats, opac = _splat(z=0.25)
    img, *_ = rasterize_dense(means, scales, quats, opac,
                              jnp.ones((1, 3)), cam)
    assert float(np.asarray(img)[16, 16, 0]) > 0.5


def test_termination_drops_crossing_gaussian():
    """Stacked splats with alpha ~= 0.8: T after k splats = 0.2^k, which
    crosses 1e-4 at the 6th splat — that splat is itself dropped with
    everything after it (forward.cu:400-405), so exactly 5 blend."""
    cam = _identity_cam()
    n = 8
    means = jnp.array([[0.0, 0.0, 2.0 + 0.1 * i] for i in range(n)])
    scales = jnp.full((n, 2), 5.0)        # huge => alpha ~= opacity
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1))
    opac = jnp.full((n,), 0.8)
    colors = jnp.ones((n, 3))
    img, allmap, *_ = rasterize_dense(means, scales, quats, opac, colors,
                                      cam)
    a = 0.8
    expect = sum(a * (1 - a) ** i for i in range(5))   # 1 - 0.2^5
    np.testing.assert_allclose(float(img[16, 16, 0]), expect, rtol=2e-4)
    # alpha channel = 1 - T_final with T_final frozen at 0.2^5
    np.testing.assert_allclose(float(allmap[16, 16, 1]),
                               1 - (1 - a) ** 5, rtol=2e-4)


def test_median_depth_rule():
    """Median depth = depth of the LAST blended splat with pre-blend
    T > 0.5 (forward.cu:418-427)."""
    cam = _identity_cam()
    n = 3
    means = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 3.0], [0.0, 0.0, 4.0]])
    scales = jnp.full((n, 2), 5.0)
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1))
    opac = jnp.full((n,), 0.45)
    colors = jnp.ones((n, 3))
    _, allmap, *_ = rasterize_dense(means, scales, quats, opac, colors,
                                    cam)
    # pre-blend T: splat0 -> 1.0 (>0.5 writes, depth 2); splat1 -> 0.55
    # (>0.5 overwrites, depth 3); splat2 -> 0.3025 (<=0.5, no write)
    np.testing.assert_allclose(float(allmap[16, 16, 5]), 3.0, rtol=1e-4)
    # median weight = w of the writer: alpha * T_before = 0.45 * 0.55
    np.testing.assert_allclose(float(allmap[16, 16, 7]), 0.45 * 0.55,
                               rtol=1e-4)


def test_allmap_channels():
    """Expected-depth channel stores sum(w*z) (alpha-weighted, not
    normalized)."""
    cam = _identity_cam()
    means, scales, quats, opac = _splat(z=2.0, s=5.0, opacity=0.6)
    _, allmap, *_ = rasterize_dense(means, scales, quats, opac,
                                    jnp.ones((1, 3)), cam)
    # single camera-facing splat: intersection depth == 2 everywhere
    np.testing.assert_allclose(float(allmap[16, 16, 0]), 0.6 * 2.0,
                               rtol=1e-4)
    np.testing.assert_allclose(float(allmap[16, 16, 1]), 0.6, rtol=1e-4)


def test_normal_flip():
    """DUAL_VISIABLE: the reported normal is flipped to face the camera
    regardless of the stored orientation (forward.cu:104-109)."""
    cam = _identity_cam()
    means = jnp.array([[0.0, 0.0, 2.0]])
    scales = jnp.array([[5.0, 5.0]])
    opac = jnp.array([0.7])
    colors = jnp.ones((1, 3))
    for quat in ([1.0, 0, 0, 0], [0.0, 1.0, 0, 0]):   # +z and -z normals
        quats = jnp.array([quat])
        _, allmap, *_ = rasterize_dense(means, scales, quats, opac,
                                        colors, cam)
        nz = float(allmap[16, 16, 4])
        # camera looks down +z; a camera-facing normal has negative z
        # component in camera frame: cos = -dot(n, p_view) > 0
        assert nz < 0, nz


def test_background_composite():
    cam = _identity_cam()
    means, scales, quats, opac = _splat(s=5.0, opacity=0.6)
    bg = jnp.array([0.2, 0.4, 0.8])
    img, *_ = rasterize_dense(means, scales, quats, opac,
                              jnp.zeros((1, 3)), cam, bg=bg)
    # C = w*color + T_final*bg = 0 + 0.4*bg
    np.testing.assert_allclose(np.asarray(img)[16, 16], 0.4 * np.asarray(
        bg), rtol=1e-4)


def test_distortion_accumulator():
    """Two splats: distortion = sum_i w_i * (m_i^2 A_i + D2_i - 2 m_i
    D1_i) with pre-blend accumulators (forward.cu:408-428)."""
    cam = _identity_cam()
    means = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 4.0]])
    scales = jnp.full((2, 2), 5.0)
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    opac = jnp.array([0.5, 0.5])
    _, allmap, *_ = rasterize_dense(means, scales, quats, opac,
                                    jnp.ones((2, 3)), cam)
    far, near = 100.0, 0.2
    m = lambda z: (far * z - far * near) / ((far - near) * z)
    m1, m2 = m(2.0), m(4.0)
    w1 = 0.5
    w2 = 0.5 * (1 - 0.5)
    # splat1: A=0 (1-T_before=0), D1=D2=0 -> err1 = 0
    # splat2: A = 1-T_before = 0.5, D1 = w1*m1, D2 = w1*m1^2
    err2 = m2 * m2 * 0.5 + w1 * m1 * m1 - 2 * m2 * w1 * m1
    np.testing.assert_allclose(float(allmap[16, 16, 6]), w2 * err2,
                               rtol=5e-4)


def test_radius_and_rect():
    """radius = ceil(3 * max(extent, 0.7071)); extent of an axis-aligned
    surfel = s * f / z pixels."""
    cam = _identity_cam()
    means, scales, quats, opac = _splat(z=2.0, s=0.5)
    *_, radii, prep = rasterize_dense(means, scales, quats, opac,
                                      jnp.ones((1, 3)), cam)
    expect = np.ceil(3 * max(0.5 * FX / 2.0, 0.7071067811865476))
    assert int(radii[0]) == int(expect)