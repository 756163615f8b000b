"""Quaternion library vs scipy + MuJoCo conventions."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from gym_kmanip_tpu.utils import rotations as rot

WXYZ_2_XYZW = [1, 2, 3, 0]
XYZW_2_WXYZ = [3, 0, 1, 2]


def rand_quats(n, seed=0):
    q = R.random(n, random_state=np.random.RandomState(seed))
    return q


def test_quat_mul_matches_scipy():
    a, b = rand_quats(64, 1), rand_quats(64, 2)
    got = rot.quat_mul(
        jnp.array(a.as_quat()[:, XYZW_2_WXYZ]), jnp.array(b.as_quat()[:, XYZW_2_WXYZ])
    )
    want = (a * b).as_quat()[:, XYZW_2_WXYZ]
    # sign ambiguity: compare up to sign
    sign = np.sign(np.sum(np.asarray(got) * want, axis=1, keepdims=True))
    np.testing.assert_allclose(np.asarray(got) * sign, want, atol=1e-6)


def test_quat_rotate_matches_matrix():
    q = rand_quats(64, 3)
    v = np.random.RandomState(4).randn(64, 3)
    got = rot.quat_rotate(jnp.array(q.as_quat()[:, XYZW_2_WXYZ]), jnp.array(v))
    want = q.apply(v)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_quat_to_mat_and_back():
    q = rand_quats(128, 5)
    qw = jnp.array(q.as_quat()[:, XYZW_2_WXYZ])
    m = rot.quat_to_mat(qw)
    np.testing.assert_allclose(np.asarray(m), q.as_matrix(), atol=1e-6)
    q2 = rot.mat_to_quat(m)
    sign = np.sign(np.sum(np.asarray(q2) * np.asarray(qw), axis=1, keepdims=True))
    np.testing.assert_allclose(np.asarray(q2) * sign, np.asarray(qw), atol=1e-6)


def test_euler_xyz_roundtrip_matches_scipy():
    e = np.random.RandomState(6).uniform(-1.2, 1.2, size=(64, 3))
    q_scipy = R.from_euler("xyz", e).as_quat()[:, XYZW_2_WXYZ]
    q_got = rot.euler_xyz_to_quat(jnp.array(e))
    sign = np.sign(np.sum(np.asarray(q_got) * q_scipy, axis=1, keepdims=True))
    np.testing.assert_allclose(np.asarray(q_got) * sign, q_scipy, atol=1e-6)
    e2 = rot.quat_to_euler_xyz(jnp.array(q_scipy))
    np.testing.assert_allclose(np.asarray(e2), e, atol=1e-5)


def test_quat_sub_matches_mujoco_semantics():
    """quat_sub must match mju_subQuat: v with qb * exp(v/2) = qa."""
    mujoco = pytest.importorskip("mujoco")
    rs = np.random.RandomState(7)
    for _ in range(32):
        qa = R.random(random_state=rs).as_quat()[XYZW_2_WXYZ]
        qb = R.random(random_state=rs).as_quat()[XYZW_2_WXYZ]
        want = np.zeros(3)
        mujoco.mju_subQuat(want, qa, qb)
        got = rot.quat_sub(jnp.array(qa), jnp.array(qb))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_quat_integrate_inverts_sub():
    rs = np.random.RandomState(8)
    q = R.random(random_state=rs).as_quat()[XYZW_2_WXYZ]
    w = rs.randn(3) * 0.5
    q2 = rot.quat_integrate(jnp.array(q), jnp.array(w), 1.0)
    # world-frame omega: q2 = exp(w/2) * q
    m2 = rot.quat_to_mat(q2)
    want = R.from_rotvec(w).as_matrix() @ R.from_quat(np.array(q)[WXYZ_2_XYZW]).as_matrix()
    np.testing.assert_allclose(np.asarray(m2), want, atol=1e-6)
