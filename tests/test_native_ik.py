"""Native (C++) host-IK backend: parity vs the numpy f64 twin + speed.

The C++ solver (gym_kmanip_tpu/native/ik_native.cpp) is a line-true port of
solvers/ik_host.py's scipy-replica TRF; the only numerical difference is
the trust-region subproblem's SVD (one-sided Jacobi vs LAPACK gesdd), so
solutions must agree to f64 rounding-accumulation levels in-distribution.
The env-level guarantee (golden-trace parity band over the native backend)
lives in tests/test_env_parity.py, which runs whatever backend solve_host
dispatches to — these tests pin the solver-level agreement and the
fallback contract.
"""

import numpy as np
import pytest

from gym_kmanip_tpu import native
from gym_kmanip_tpu.models import get_model
from gym_kmanip_tpu.solvers.ik_host import _solve_np

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native IK unavailable: {native.load_error()}",
)

CASES = [
    ("solo_arm", "r"),
    ("dual_arm", "r"),
    ("dual_arm", "l"),
    ("torso", "r"),
    ("torso", "l"),
]


def _mask_for(model, side):
    """Arm-joint mask for one side (mirrors env/config.py q_id_*_mask:
    the hinge joints whose site-side chain the EE site hangs off)."""
    site = model.site(f"ee{side}_site")
    anc = np.asarray(model.ancestors[site.parent])
    hinge = np.asarray(model.jnt_type) == 0
    return tuple(int(i) for i in np.nonzero(anc & hinge)[0])


@pytest.mark.parametrize("name,side", CASES)
def test_native_matches_numpy(name, side):
    model = get_model(name)
    mask = _mask_for(model, side)
    rng = np.random.default_rng(0)
    lo = model.jnt_range[list(mask), 0]
    hi = model.jnt_range[list(mask), 1]
    n_match = 0
    for trial in range(40):
        qpos = np.asarray(model.home_qpos, np.float64).copy()
        # in-range warm start (out-of-range short-circuits identically by
        # construction; covered by its own test below)
        qpos[list(mask)] = np.clip(
            lo + rng.uniform(0.1, 0.9, len(mask)) * (hi - lo), lo, hi
        )
        from gym_kmanip_tpu.solvers.ik_host import fk_np, site_pose_np

        xpos, xquat, _ = fk_np(model, qpos)
        p, q = site_pose_np(model, xpos, xquat, f"ee{side}_site")
        goal_pos = p + rng.uniform(-0.05, 0.05, 3)
        # small random rotation of the current orientation
        ang = rng.uniform(-0.2, 0.2, 3)
        from gym_kmanip_tpu.solvers.ik_host import _qmul

        half = np.linalg.norm(ang) / 2 + 1e-12
        axis = ang / (2 * half)
        dq = np.concatenate([[np.cos(half)], np.sin(half) * axis])
        goal_orn = _qmul(q, dq)
        goal_orn /= np.linalg.norm(goal_orn)

        args = (qpos, goal_pos, goal_orn, model.home_qpos, qpos)
        kw = dict(model=model, q_mask=mask, site_name=f"ee{side}_site")
        q_np, scrib_np = _solve_np(*args, **kw)
        q_cc, scrib_cc = native.solve_ik_native(*args, **kw)
        # identical TRF decisions almost always; SVD rounding can flip a
        # late termination branch on near-flat directions, so allow a tiny
        # fraction of looser agreements and bound those too
        if np.max(np.abs(q_np - q_cc)) < 1e-6:
            n_match += 1
        np.testing.assert_allclose(q_cc, q_np, atol=5e-3)
        np.testing.assert_allclose(scrib_cc, scrib_np, atol=5e-3)
    assert n_match >= 36, f"only {n_match}/40 solves agreed to 1e-6"


def test_out_of_bounds_warm_start_short_circuits():
    model = get_model("torso")
    mask = _mask_for(model, "r")
    qpos = np.asarray(model.home_qpos, np.float64).copy()
    # torso's home parks joints OUTSIDE their range (the reference quirk) —
    # both backends must return the clipped warm start without solving
    lo = model.jnt_range[list(mask), 0]
    q_np, s_np = _solve_np(
        qpos, np.zeros(3), np.array([1.0, 0, 0, 0]), model.home_qpos, qpos,
        model=model, q_mask=mask, site_name="eer_site",
    )
    q_cc, s_cc = native.solve_ik_native(
        qpos, np.zeros(3), np.array([1.0, 0, 0, 0]), model.home_qpos, qpos,
        model=model, q_mask=mask, site_name="eer_site",
    )
    if np.any((qpos[list(mask)] < lo)):
        np.testing.assert_array_equal(q_cc, q_np)
        np.testing.assert_array_equal(s_cc, s_np)


def test_native_is_faster():
    """The point of the native backend: >=10x over the numpy interpreter
    path on the solo-arm solve (measured ~100x; keep the bar conservative
    for loaded CI machines)."""
    import time

    model = get_model("solo_arm")
    mask = _mask_for(model, "r")
    qpos = np.asarray(model.home_qpos, np.float64).copy()
    from gym_kmanip_tpu.solvers.ik_host import fk_np, site_pose_np

    xpos, xquat, _ = fk_np(model, qpos)
    p, _q = site_pose_np(model, xpos, xquat, "eer_site")
    goal = p + np.array([0.01, -0.02, 0.01])
    orn = np.array([1.0, 0, 0, 0])
    args = (qpos, goal, orn, model.home_qpos, qpos)
    kw = dict(model=model, q_mask=mask, site_name="eer_site")

    for backend in (_solve_np, native.solve_ik_native):
        backend(*args, **kw)  # warm (native: triggers build/load)

    t0 = time.perf_counter()
    for _ in range(3):
        _solve_np(*args, **kw)
    t_np = (time.perf_counter() - t0) / 3
    reps = 50
    t0 = time.perf_counter()
    for _ in range(reps):
        native.solve_ik_native(*args, **kw)
    t_cc = (time.perf_counter() - t0) / reps
    assert t_cc < t_np / 10, f"native {t_cc*1e3:.2f}ms vs numpy {t_np*1e3:.2f}ms"


def test_solve_host_dispatch():
    """solve_host routes to the native backend when available."""
    from gym_kmanip_tpu.solvers import ik_host

    model = get_model("solo_arm")
    mask = _mask_for(model, "r")
    qpos = np.asarray(model.home_qpos, np.float64)
    out = ik_host.solve_host(
        qpos, np.array([0.3, 0.4, 0.8]), np.array([1.0, 0, 0, 0]),
        model.home_qpos, qpos, model=model, q_mask=mask,
        site_name="eer_site",
    )
    assert out[0].dtype == np.float32 and out[0].shape == (len(mask),)
