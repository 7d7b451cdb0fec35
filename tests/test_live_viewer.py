"""Live viewer (viz/live.py): the browser-stream stand-in for the
reference's Pangolin window must serve the dashboard, the latest map and
frame renders, and live state while the system tracks."""

import json
import urllib.error
import urllib.request

import numpy as np

from dr_slam_tpu.io import synthetic
from dr_slam_tpu.slam.system import System
from tests.test_tracking_e2e import small_cfg


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_live_viewer_serves_while_tracking():
    cfg = small_cfg()
    n = 12
    seq = synthetic.SyntheticSequence(synthetic.corridor_trajectory(n),
                                      K4=cfg.camera.K4, height=240, width=320)
    sys_ = System(cfg, enable_loop_closing=False, live_viewer=True)
    sys_._live.every = 1
    sys_._live.min_period = 0.0
    port = sys_._live.port
    try:
        for i in range(n):
            g, d = seq.render(i)
            sys_.track_rgbd(np.asarray(g), np.asarray(d), i / 30.0)
        # rendering is asynchronous (latest-wins worker): drain it before
        # asserting on the served content
        sys_._live.flush()

        code, ctype, body = _get(port, "/")
        assert code == 200 and "text/html" in ctype
        assert b"map.mjpg" in body and b"frame.mjpg" in body

        code, _, body = _get(port, "/state.json")
        st = json.loads(body)
        assert code == 200
        assert st["frame"] == n
        assert st["n_keyframes"] >= 1
        assert st["n_points"] > 0
        assert len(st["t_wc"]) == 3

        for path in ("/map.png", "/frame.png"):
            code, ctype, body = _get(port, path)
            assert code == 200 and ctype == "image/png"
            assert body[:8] == b"\x89PNG\r\n\x1a\n"
            assert len(body) > 5000  # a real render, not a stub image

        try:
            _get(port, "/nope")
            raise AssertionError("expected 404 for unknown path")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        sys_._live.close()
