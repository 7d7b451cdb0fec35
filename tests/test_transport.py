"""Transport layer: wire format, approximate-time sync, end-to-end node.

Capability under test: the reference's ROS node loop (Examples/RGB-D/
main_ros.cc:94-135 -- synchronized RGB+depth subscription feeding TrackRGBD,
save-map / save-occupancy commands, odometry publication System.cc:574-615)
rebuilt as a broker-less socket protocol (dr_slam_tpu/io/transport.py)."""

import socket
import threading

import numpy as np
import pytest

from dr_slam_tpu.io import transport as tp


def _sockpair():
    a, b = socket.socketpair()
    return a, b


def test_wire_roundtrip_array_and_json():
    a, b = _sockpair()
    img = (np.arange(12, dtype=np.uint8).reshape(3, 4) * 7) % 255
    tp.send_message(a, tp.TOPIC_RGB, 1.25, img)
    tp.send_message(a, tp.TOPIC_CMD, 0.0, {"cmd": "save_map", "path": "x"})
    topic, stamp, data = tp.recv_message(b)
    assert topic == tp.TOPIC_RGB and stamp == 1.25
    assert data.dtype == np.uint8 and np.array_equal(data, img)
    topic, _, data = tp.recv_message(b)
    assert topic == tp.TOPIC_CMD and data["cmd"] == "save_map"
    a.close()
    assert tp.recv_message(b) is None  # clean close
    b.close()


def test_wire_float_depth_roundtrip():
    a, b = _sockpair()
    depth = np.random.RandomState(0).rand(5, 7).astype(np.float32)
    tp.send_message(a, tp.TOPIC_DEPTH, 2.0, depth)
    _, _, out = tp.recv_message(b)
    assert out.dtype == np.float32 and np.allclose(out, depth)
    a.close(); b.close()


def test_approximate_time_sync_pairs_within_slop():
    sync = tp.ApproximateTimeSync(slop=0.02)
    assert sync.add(0, 1.000, "rgb0") is None
    got = sync.add(1, 1.008, "dep0")          # within slop -> pair
    assert got == (1.000, "rgb0", "dep0")
    # far-apart stamps never pair
    assert sync.add(0, 2.000, "rgb1") is None
    assert sync.add(1, 2.500, "depX") is None
    # the late depth at 2.501 pairs with nothing; a matching one pairs
    got = sync.add(1, 2.004, "dep1")
    assert got is not None and got[1] == "rgb1" and got[2] == "dep1"


def test_approximate_time_sync_drops_stale():
    sync = tp.ApproximateTimeSync(slop=0.01, queue_size=3)
    for i in range(5):                        # rgb-only flood
        assert sync.add(0, float(i), f"rgb{i}") is None
    # queue keeps only the 3 newest; old ones can no longer match
    assert sync.add(1, 0.0, "dep") is None
    got = sync.add(1, 4.0, "dep4")
    assert got == (4.0, "rgb4", "dep4")


def test_slam_node_end_to_end(tmp_path):
    """Stream a synthetic corridor through the socket node: odometry must
    come back for every frame, track OK, and the command surface must
    produce a map file and an occupancy grid message."""
    from dr_slam_tpu.io import synthetic
    from dr_slam_tpu.slam.system import System
    from tests.test_tracking_e2e import small_cfg

    cfg = small_cfg()
    n = 10
    seq = synthetic.SyntheticSequence(
        synthetic.corridor_trajectory(n, step=0.03), K4=cfg.camera.K4,
        height=240, width=320)
    server = tp.SlamServer(System(cfg, enable_loop_closing=False),
                           slop=1.0 / 60.0)
    done = {}

    def run():
        done["n"] = server.serve_once()

    th = threading.Thread(target=run, daemon=True)
    th.start()
    client = tp.CameraClient(server.address)

    odoms = []
    for i in range(n):
        gray, depth = seq.render(i)
        # RGB topic carries 3-channel uint8 like the ROS driver would
        rgb = np.repeat(np.asarray(gray, np.uint8)[..., None], 3, axis=-1)
        client.publish_frame(i / 30.0, rgb, np.asarray(depth))
        msg = client.recv()
        assert msg is not None and msg[0] == tp.TOPIC_ODOM
        odoms.append(msg[2])

    assert len(odoms) == n
    assert sum(o["state"] == "OK" for o in odoms) >= n - 1
    assert all(np.isfinite(o["position"]).all() for o in odoms)
    # camera advances forward: |position| of last frame > first
    assert (np.linalg.norm(odoms[-1]["position"])
            > np.linalg.norm(odoms[0]["position"]))

    # save_map command writes the npz map
    map_path = str(tmp_path / "map.npz")
    client.command(cmd="save_map", path=map_path)
    topic, _, status = client.recv()
    assert topic == tp.TOPIC_STATUS and status["ok"]
    assert (tmp_path / "map.npz").exists()

    # occupancy export: per-KF odometry, then the grid, then status
    client.command(cmd="save_occupancy", resolution=0.05)
    kf_odoms, grid, status = [], None, None
    while True:
        topic, _, data = client.recv()
        if topic == tp.TOPIC_ODOM:
            kf_odoms.append(data)
        elif topic == tp.TOPIC_OCC:
            grid = data
        elif topic == tp.TOPIC_STATUS:
            status = data
            break
    assert status["ok"] and status["keyframes"] == len(kf_odoms) >= 1
    assert grid is not None and grid.ndim == 2 and grid.sum() > 0

    client.command(cmd="shutdown")
    th.join(timeout=30)
    assert done.get("n") == n
    client.close()
    server.close()
