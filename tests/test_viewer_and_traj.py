"""Network viewer protocol, bezier trajectories, trajectory rendering."""
import json
import socket
import threading

import numpy as np
import jax.numpy as jnp


def test_viewer_roundtrip():
    from d2dgs_tpu.viewer import ViewerServer
    srv = ViewerServer(port=0, echo="scene")

    W = H = 8
    # identity pose, camera at origin looking +z (OpenCV), as the SIBR
    # client would send it: transposed w2c with y/z columns negated
    w2c = np.eye(4, dtype=np.float32)
    view = w2c.T.copy()
    view[:, 1] *= -1
    view[:, 2] *= -1
    msg = {"resolution_x": W, "resolution_y": H, "train": True,
           "fov_x": 0.8, "fov_y": 0.8, "z_near": 0.01, "z_far": 100.0,
           "shs_python": False, "rot_scale_python": False,
           "keep_alive": True, "scaling_modifier": 1.0,
           "view_matrix": view.reshape(-1).tolist(),
           "view_projection_matrix": np.eye(4).reshape(-1).tolist()}

    got = {}

    def client():
        c = socket.create_connection(("127.0.0.1", srv.port), timeout=10)
        payload = json.dumps(msg).encode()
        c.sendall(len(payload).to_bytes(4, "little") + payload)
        img = b""
        while len(img) < H * W * 3:
            img += c.recv(H * W * 3 - len(img))
        n = int.from_bytes(c.recv(4), "little")
        echo = c.recv(n).decode()
        got["img"], got["echo"] = img, echo
        c.close()

    t = threading.Thread(target=client)
    t.start()

    seen = {}

    def render_fn(cam, scaling_modifier):
        seen["cam"] = cam
        seen["sm"] = scaling_modifier
        return jnp.full((cam.H, cam.W, 3), 0.5)

    # poll until the round-trip completes (first polls may race the
    # accept and the client thread's scheduling — wait on wall clock,
    # not a fixed poll count)
    import time
    deadline = time.time() + 20.0
    while time.time() < deadline and "img" not in got:
        srv.poll(render_fn)
        time.sleep(0.005)
    t.join(timeout=10)
    srv.close()
    assert got["echo"] == "scene"
    assert len(got["img"]) == H * W * 3
    assert got["img"][0] == 127  # 0.5 -> 127
    cam = seen["cam"]
    assert cam.H == H and cam.W == W
    np.testing.assert_allclose(np.asarray(cam.w2c), np.eye(4), atol=1e-6)


def test_bezier_interpolation():
    from d2dgs_tpu.utils.bezier import bezier_trajectory, de_casteljau
    ctrl = jnp.asarray([[0.0, 0.0], [1.0, 2.0], [2.0, 0.0]])
    p0 = de_casteljau(ctrl, 0.0)
    p1 = de_casteljau(ctrl, 1.0)
    np.testing.assert_allclose(np.asarray(p0), [0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1), [2, 0], atol=1e-6)
    mid = np.asarray(de_casteljau(ctrl, 0.5))
    assert mid[1] > 0.5  # pulled toward the middle control point

    kp = jnp.asarray([[0.0, 0.0], [1.0, 1.0], [2.0, 0.0], [3.0, 1.0]])
    traj = np.asarray(bezier_trajectory(kp, jnp.linspace(0, 1, 7)))
    np.testing.assert_allclose(traj[0], [0, 0], atol=1e-5)
    np.testing.assert_allclose(traj[-1], [3, 1], atol=1e-5)
    # monotone-ish x progression
    assert np.all(np.diff(traj[:, 0]) > -1e-4)


def test_ellipse_path_and_time_sweep():
    from d2dgs_tpu.eval.trajectories import ellipse_path, time_sweep_cameras
    cams = ellipse_path(8, 3.0, 0.2, 0.8, 16, 16, times="sweep")
    assert len(cams) == 8
    ts = [float(c.time) for c in cams]
    assert ts[0] == 0.0 and abs(ts[-1] - 1.0) < 1e-6
    # all at radius 3 from origin
    for c in cams:
        assert abs(np.linalg.norm(np.asarray(c.cam_center)) - 3.0) < 1e-4
    sweep = time_sweep_cameras(cams[0], 5)
    assert all(np.allclose(np.asarray(s.w2c), np.asarray(cams[0].w2c))
               for s in sweep)
    assert abs(float(sweep[-1].time) - 1.0) < 1e-6


def test_render_trajectory_writes_frames(tmp_path):
    import jax

    from d2dgs_tpu.config import RasterConfig
    from d2dgs_tpu.eval.trajectories import ellipse_path, render_trajectory
    from d2dgs_tpu.train.config import TrainConfig
    from d2dgs_tpu.train.trainer import init_train_state

    cfg = TrainConfig(sh_degree=1, hyper_dim=2, node_num=16,
                      gaussian_capacity=64, node_gauss_capacity=32,
                      raster=RasterConfig(tile_cap=64, chunk=32))
    pts = np.random.RandomState(0).randn(64, 3).astype(np.float32) * 0.3
    cols = np.full((64, 3), 0.5, np.float32)
    state = init_train_state(jax.random.PRNGKey(0), cfg, pts, cols)
    cams = ellipse_path(2, 3.0, 0.2, 0.8, 16, 16, times="sweep")
    frames = render_trajectory(cams, state.gauss, state.nodes,
                               cfg.node_cfg, cfg.raster,
                               out_dir=str(tmp_path), fps=10)
    assert len(frames) == 2 and frames[0].shape == (16, 16, 3)
    assert (tmp_path / "00000.png").exists()
    assert (tmp_path / "video.gif").exists()
