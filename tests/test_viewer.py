"""Live viewer (gym_kmanip_tpu/viewer.py): HTTP surface + teleop wiring.

Runs the REAL env and REAL HTTP server on an ephemeral port — the browser
is replaced by urllib. Covers what the reference never tested at all (its
viewer is dm_control's GUI, /root/reference/gym_kmanip/examples/0_viewer.py:48).
"""

import json
import threading
import urllib.request

import gymnasium as gym
import numpy as np
import pytest

import gym_kmanip_tpu  # noqa: F401
from gym_kmanip_tpu.viewer import LiveViewer


@pytest.fixture(scope="module")
def viewer():
    env = gym.make("KManipSoloArm")
    v = LiveViewer(env, port=0)  # ephemeral port
    url = v.start_server()
    env.reset(seed=0)
    v.step_once()  # publish the first frame
    yield v, url
    v.stop()
    env.close()


def _get(url, path):
    with urllib.request.urlopen(url + path, timeout=10) as r:
        return r.status, r.read(), r.headers.get("Content-Type")


def test_index_page(viewer):
    v, url = viewer
    status, body, ctype = _get(url, "/")
    assert status == 200 and ctype.startswith("text/html")
    assert b"live viewer" in body and b"/frame.png" in body


def test_frame_is_png(viewer):
    v, url = viewer
    status, body, ctype = _get(url, "/frame.png")
    assert status == 200 and ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_state_json(viewer):
    v, url = viewer
    status, body, _ = _get(url, "/state")
    s = json.loads(body)
    assert s["step"] >= 1 and "reward" in s and "grip" in s


def test_key_post_moves_ee(viewer):
    v, url = viewer
    req = urllib.request.Request(
        url + "/action", data=json.dumps({"key": "w"}).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.status == 200
    act, want_reset = v._compose_action()
    assert not want_reset
    assert act["eer_pos"][1] == 1.0  # 'w' = +y impulse
    # impulse consumed: next compose is zero again
    act2, _ = v._compose_action()
    assert act2["eer_pos"][1] == 0.0


def test_grip_toggle_and_reset(viewer):
    v, url = viewer
    g0 = v._grip
    v.handle_key(" ")
    assert v._grip == -g0
    v.handle_key("r")
    act, want_reset = v._compose_action()
    assert want_reset


def test_pause_skips_stepping(viewer):
    v, url = viewer
    v.handle_key("p")
    step_before = v._state["step"]
    v.step_once()
    assert v._state["step"] == step_before
    v.handle_key("p")  # unpause for any later test
    v.step_once()
    assert v._state["step"] == step_before + 1


def test_concurrent_requests(viewer):
    """ThreadingHTTPServer under concurrent poll load (the browser polls
    /frame.png and /state at ~20 Hz each)."""
    v, url = viewer
    errs = []

    def poll(path):
        try:
            for _ in range(5):
                status, _, _ = _get(url, path)
                assert status == 200
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=poll, args=(p,))
               for p in ("/frame.png", "/state", "/") * 2]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
