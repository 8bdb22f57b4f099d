"""Live interactive viewer: HTTP surface + keyboard semantics
(the reference Isaac Gym viewer role, ref base_task.py:86-148)."""
import json
import urllib.request

import numpy as np

from legged_gym_dev_tpu.sim.dynamics import RobotModel
from legged_gym_dev_tpu.sim.urdf import parse_urdf
from legged_gym_dev_tpu.utils.live_viewer import LiveViewer

HOPPER_URDF = "/root/reference/resources/robots/hopper/urdf/hopper.urdf"


def test_live_viewer_http_and_keys():
    model = RobotModel.from_spec(parse_urdf(HOPPER_URDF))
    v = LiveViewer(model, port=0, width=128, height=96)
    try:
        base = f"http://127.0.0.1:{v.port}"
        # index page served
        html = urllib.request.urlopen(base + "/", timeout=5).read()
        assert b"live viewer" in html
        # feed one state; force render (no client poll yet)
        nj = model.nj
        v.push_state(np.array([0.0, 0.0, 0.6]),
                     np.array([0.0, 0.0, 0.0, 1.0]),
                     np.zeros(nj), force_render=True)
        png = urllib.request.urlopen(base + "/frame.png", timeout=5).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n" and len(png) > 500
        # keyboard semantics: SPACE pauses, V toggles sync, ESC queues quit
        def key(k):
            urllib.request.urlopen(urllib.request.Request(
                base + "/key", data=json.dumps({"key": k}).encode(),
                method="POST"), timeout=5).read()

        key(" ")
        key("v")
        key("ArrowLeft")
        key("-")
        key("Escape")
        st = json.loads(urllib.request.urlopen(
            base + "/state.json", timeout=5).read())
        assert st["paused"] is True and st["sync"] is False
        assert st["cam"]["azimuth"] == 125.0
        assert st["frames"] == 1
        assert "quit" in v.pop_events()
        # batched state path + client-connected gating: sync off -> no render
        v.push_state(np.zeros((4, 3)), np.tile([0, 0, 0, 1.0], (4, 1)),
                     np.zeros((4, nj)))
        assert v._frames == 1
    finally:
        v.close()
