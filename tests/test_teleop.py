"""Gesture-mapping and scene parity for VR teleop (no vuer required).

Feature checklist vs the reference handler (4_teleop.py:136-205): pinch-
gated tracking, thumb-anchor position deltas, wrist-matrix orientation
deltas, thumb-middle grip distance, thumb-pinky reset with backoff, left
hand mirrored for bimanual (including the reference's left-pinky
anchor-only quirk), and the full static/dynamic scene upsert set.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from gym_kmanip_tpu import teleop as tp


def _landmarks(thumb=(0, 0, 0), index=(1, 1, 1), middle=(1, 1, 1),
               pinky=(1, 1, 1)):
    lm = np.ones((25, 3)) * 5.0  # far away by default
    lm[tp.FINGER_THUMB] = thumb
    lm[tp.FINGER_INDEX] = index
    lm[tp.FINGER_MIDLE] = middle
    lm[tp.FINGER_PINKY] = pinky
    return lm.tolist()


def _wrist(euler_xyz=(0.0, 0.0, 0.0)):
    m = np.eye(4)
    m[:3, :3] = R.from_euler("xyz", euler_xyz).as_matrix()
    return m.reshape(-1).tolist()


def test_pinch_tracking_position_and_orientation():
    ts = tp.TeleopState(bimanual=False, hr_anchor=np.array([0.1, 0.2, 0.3]))
    thumb = (0.02, 0.0, 0.0)
    ts.handle({
        "rightLandmarks": _landmarks(
            thumb=thumb, index=(0.025, 0.0, 0.0), middle=(0.07, 0.0, 0.0)
        ),
        "rightHand": _wrist((0.0, 0.0, 0.4)),
    })
    np.testing.assert_allclose(
        ts.right.ee_pos, np.array([0.1, 0.2, 0.3]) - np.asarray(thumb),
        atol=1e-12,
    )
    # anchor orn is zero, wrist rotated 0.4 about z -> delta euler -0.4
    np.testing.assert_allclose(ts.right.ee_orn, [0, 0, -0.4], atol=1e-9)
    # grip = |thumb - middle| / PINCH_OPEN = 0.05 / 0.10
    assert ts.right.grip == pytest.approx(0.5)
    assert not ts.reset_requested


def test_no_pinch_no_tracking():
    ts = tp.TeleopState(bimanual=False)
    ts.handle({"rightLandmarks": _landmarks(), "rightHand": _wrist()})
    np.testing.assert_array_equal(ts.right.ee_pos, np.zeros(3))
    assert ts.right.grip == 0.0


def test_pinky_reset_and_reanchor_with_backoff():
    ts = tp.TeleopState(bimanual=False)
    thumb = (0.3, 0.1, 0.2)
    ts.handle({
        "rightLandmarks": _landmarks(thumb=thumb, pinky=(0.305, 0.1, 0.2)),
        "rightHand": _wrist((0.1, 0.0, 0.0)),
    })
    assert ts.reset_requested
    np.testing.assert_allclose(ts.right.anchor_pos, thumb)
    np.testing.assert_allclose(ts.right.anchor_orn, [0.1, 0, 0], atol=1e-9)
    # debounce: 0.5 s after the last reset -> suppressed (and stays pending)
    assert not ts.consume_reset(now=100.5, last_reset=100.0)
    assert ts.consume_reset(now=101.5, last_reset=100.0)
    assert not ts.consume_reset(now=101.6, last_reset=101.5)  # consumed


def test_left_hand_bimanual_mirror_and_quirk():
    ts = tp.TeleopState(bimanual=True, hl_anchor=np.array([0.0, 0.5, 0.0]))
    ts.handle({
        "rightLandmarks": _landmarks(),
        "rightHand": _wrist(),
        "leftLandmarks": _landmarks(
            thumb=(0.0, 0.4, 0.0), index=(0.005, 0.4, 0.0),
            middle=(0.0, 0.4, 0.08), pinky=(0.0, 0.405, 0.0),
        ),
        "leftHand": _wrist(),
    })
    np.testing.assert_allclose(ts.left.ee_pos, [0.0, 0.1, 0.0], atol=1e-12)
    assert ts.left.grip == pytest.approx(0.8)
    # reference quirk: LEFT pinky pinch re-anchors but never requests reset
    assert not ts.reset_requested
    np.testing.assert_allclose(ts.left.anchor_pos, [0.0, 0.4, 0.0])
    a = ts.action()
    assert set(a) == {"eer_pos", "eer_orn", "grip_r",
                      "eel_pos", "eel_orn", "grip_l"}


def test_solo_ignores_left_hand():
    ts = tp.TeleopState(bimanual=False)
    ts.handle({
        "rightLandmarks": _landmarks(),
        "rightHand": _wrist(),
        "leftLandmarks": _landmarks(thumb=(0, 0, 0), index=(0.001, 0, 0)),
        "leftHand": _wrist(),
    })
    assert ts.left.grip == 0.0
    assert set(ts.action()) == {"eer_pos", "eer_orn", "grip_r"}


@pytest.fixture(scope="module")
def solo_env():
    import gymnasium as gym

    import gym_kmanip_tpu  # noqa: F401

    env = gym.make("KManipSoloArm")
    env.reset(seed=0)
    yield env
    env.close()


def test_scene_descriptors(solo_env):
    items = tp.scene_static(solo_env, "https://example.test/robot.urdf")
    by_key = {i.get("key"): i for i in items if "key" in i}
    assert {"hands", "robot", "cube", "table", "hand_r"} <= set(by_key)
    assert "hand_l" not in by_key  # solo
    assert by_key["robot"]["src"] == "https://example.test/robot.urdf"
    assert len(by_key["robot"]["jointValues"]) == solo_env.unwrapped.q_len
    assert np.all(np.isfinite(by_key["cube"]["position"]))
    assert by_key["table"]["args"] == tp.TABLE_SIZE.tolist()

    ts = tp.TeleopState(bimanual=False)
    dyn = tp.scene_dynamic(solo_env, ts)
    keys = [i["key"] for i in dyn]
    assert keys == ["robot", "cube", "hand_r"]
    jv = dyn[0]["jointValues"]
    assert set(jv) == set(solo_env.unwrapped.q_keys)
    assert all(np.isfinite(v) for v in jv.values())
