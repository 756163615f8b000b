"""Pallas TPU kernel tests (skipped off-TPU; the kernels are TPU-only).

Run manually on hardware: JAX_PLATFORMS=axon python -m pytest tests/test_pallas.py
(conftest.py pins the suite to CPU, where pallas TPU kernels cannot lower;
interpret mode is exercised instead so the kernel logic is still covered.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _make_problem(K=256, n=10, seed=0):
    rng = np.random.RandomState(seed)
    A = rng.randn(K, n, n)
    M = jnp.asarray(A @ A.transpose(0, 2, 1) + 5 * np.eye(n), dtype=jnp.float32)
    b = jnp.asarray(rng.randn(K, n), dtype=jnp.float32)
    ref = np.linalg.solve(
        np.asarray(M, dtype=np.float64), np.asarray(b, dtype=np.float64)[..., None]
    )[..., 0]
    return M, b, ref


def test_cholesky_kernel_interpret_mode():
    """Kernel logic via the Pallas interpreter (runs on any backend)."""
    from functools import partial

    from jax.experimental import pallas as pl
    from gym_kmanip_tpu.ops.pallas_linalg import _chol_solve_kernel

    K, n = 8, 6
    M, b, ref = _make_problem(K, n)
    Mt = M.reshape(K, n * n).T
    bt = b.T
    out = pl.pallas_call(
        partial(_chol_solve_kernel, n),
        out_shape=jax.ShapeDtypeStruct((n, K), M.dtype),
        interpret=True,
    )(Mt, bt)
    np.testing.assert_allclose(np.asarray(out.T), ref, atol=1e-4)


@pytest.mark.skipif(
    jax.default_backend() not in ("tpu",), reason="pallas TPU kernel needs TPU"
)
def test_cholesky_kernel_tpu():
    from gym_kmanip_tpu.ops.pallas_linalg import cholesky_solve_pallas

    M, b, ref = _make_problem()
    x = jax.jit(cholesky_solve_pallas)(M, b)
    np.testing.assert_allclose(np.asarray(x), ref, atol=1e-4)


@pytest.mark.parametrize("name", ["solo_arm", "torso"])
def test_rnea_kernel_interpret_mode(name):
    """Fused FK+RNEA kernel matches the jnp reference op-for-op."""
    from functools import partial

    from jax.experimental import pallas as pl

    from gym_kmanip_tpu.models import get_model
    from gym_kmanip_tpu.ops import kinematics as kin
    from gym_kmanip_tpu.ops.pallas_dynamics import _rnea_kernel

    m = get_model(name)
    K, nq = 4, m.nq
    rng = np.random.RandomState(0)
    q = jnp.asarray(
        rng.uniform(m.jnt_range[:, 0].clip(-3), m.jnt_range[:, 1].clip(max=3), (K, nq)),
        dtype=jnp.float32,
    )
    v = jnp.asarray(rng.randn(K, nq) * 0.4, dtype=jnp.float32)
    xp_t, xq_t, ax_t, b_t = pl.pallas_call(
        partial(_rnea_kernel, m, -9.81),
        out_shape=(
            jax.ShapeDtypeStruct((nq * 3, K), jnp.float32),
            jax.ShapeDtypeStruct((nq * 4, K), jnp.float32),
            jax.ShapeDtypeStruct((nq * 3, K), jnp.float32),
            jax.ShapeDtypeStruct((nq, K), jnp.float32),
        ),
        interpret=True,
    )(q.T, v.T)
    xp_r, xq_r, ax_r, b_r = jax.vmap(lambda a, b: kin.rnea_terms(m, a, b))(q, v)
    np.testing.assert_allclose(np.asarray(xp_t.T.reshape(K, nq, 3)), np.asarray(xp_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(xq_t.T.reshape(K, nq, 4)), np.asarray(xq_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ax_t.T.reshape(K, nq, 3)), np.asarray(ax_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b_t.T), np.asarray(b_r), atol=1e-4)


def test_contacts_kernel_interpret_mode():
    """Fused contact kernel matches the jnp reference (forces + flags)."""
    from functools import partial

    from jax.experimental import pallas as pl

    from gym_kmanip_tpu.dynamics import contacts
    from gym_kmanip_tpu.models import get_model
    from gym_kmanip_tpu.ops.pallas_contacts import _contacts_kernel

    m = get_model("solo_arm")
    T = len(m.fingertips)
    K = 8
    rng = np.random.RandomState(1)
    tip_pos = jnp.asarray(
        np.array([0.2, 0.5, 0.62]) + rng.randn(K, T, 3) * 0.02, dtype=jnp.float32
    )
    tip_vel = jnp.asarray(rng.randn(K, T, 3) * 0.2, dtype=jnp.float32)
    cube_pos = jnp.asarray(
        np.tile([0.2, 0.5, 0.62], (K, 1)) + rng.randn(K, 3) * 0.005, dtype=jnp.float32
    )
    qn = rng.randn(K, 4) * 0.1 + np.array([1.0, 0, 0, 0])
    qn /= np.linalg.norm(qn, axis=1, keepdims=True)
    cube_quat = jnp.asarray(qn, dtype=jnp.float32)
    clv = jnp.asarray(rng.randn(K, 3) * 0.1, dtype=jnp.float32)
    cav = jnp.asarray(rng.randn(K, 3) * 0.3, dtype=jnp.float32)

    cube = jnp.concatenate([cube_pos, cube_quat, clv, cav], axis=1).T
    fc, tc, tf, touch, ttab = pl.pallas_call(
        partial(_contacts_kernel, m),
        out_shape=(
            jax.ShapeDtypeStruct((3, K), jnp.float32),
            jax.ShapeDtypeStruct((3, K), jnp.float32),
            jax.ShapeDtypeStruct((T * 3, K), jnp.float32),
            jax.ShapeDtypeStruct((T, K), jnp.float32),
            jax.ShapeDtypeStruct((1, K), jnp.float32),
        ),
        interpret=True,
    )(tip_pos.reshape(K, T * 3).T, tip_vel.reshape(K, T * 3).T, cube)

    rad = jnp.asarray([t.radius for t in m.fingertips], dtype=jnp.float32)
    ref = jax.vmap(
        lambda a, b, c, d, e, g: contacts.contact_forces(a, b, rad, c, d, e, g)
    )(tip_pos, tip_vel, cube_pos, cube_quat, clv, cav)
    np.testing.assert_allclose(np.asarray(fc.T), np.asarray(ref.force_cube), atol=1e-4)
    np.testing.assert_allclose(np.asarray(tc.T), np.asarray(ref.torque_cube), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(tf.T.reshape(K, T, 3)), np.asarray(ref.tip_forces), atol=1e-4
    )
    assert bool(jnp.all((touch.T > 0.5) == ref.touch_tip))
    assert bool(jnp.all((ttab[0] > 0.5) == ref.touch_table))


@pytest.mark.parametrize("dt,implicit", [(0.02, True), (0.002, False)])
def test_fused_substep_kernel_interpret_mode(dt, implicit):
    """The whole-substep kernel matches the jnp substep in both MPC mode
    (dt=0.02, stable-PD) and env mode (dt=0.002, explicit)."""
    from functools import partial

    from jax.experimental import pallas as pl

    from gym_kmanip_tpu.dynamics.engine import _substep_jnp
    from gym_kmanip_tpu.dynamics.state import SimState
    from gym_kmanip_tpu.models import get_model
    from gym_kmanip_tpu.ops.pallas_substep import _substep_kernel

    m = get_model("solo_arm")
    nq, nu, T, K = m.nq, m.nu, len(m.fingertips), 8
    rng = np.random.RandomState(3)
    q = jnp.asarray(np.tile(m.home_qpos, (K, 1)) + rng.randn(K, nq) * 0.05, dtype=jnp.float32)
    v = jnp.asarray(rng.randn(K, nq) * 0.3, dtype=jnp.float32)
    ctrl = jnp.asarray(
        np.tile(m.home_qpos[:nu], (K, 1)) + rng.randn(K, nu) * 0.05, dtype=jnp.float32
    )
    cube_pos = jnp.asarray(
        np.tile([0.23, 0.52, 0.62], (K, 1)) + rng.randn(K, 3) * 0.01, dtype=jnp.float32
    )
    qn = rng.randn(K, 4) * 0.05 + np.array([1.0, 0, 0, 0])
    qn /= np.linalg.norm(qn, axis=1, keepdims=True)
    cube13 = jnp.concatenate(
        [cube_pos, jnp.asarray(qn, dtype=jnp.float32),
         jnp.asarray(rng.randn(K, 3) * 0.1, dtype=jnp.float32),
         jnp.asarray(rng.randn(K, 3) * 0.3, dtype=jnp.float32)], axis=1,
    )

    qo, vo, co, touch, xp, xq = pl.pallas_call(
        partial(_substep_kernel, m, dt, True, implicit),
        out_shape=(
            jax.ShapeDtypeStruct((nq, K), jnp.float32),
            jax.ShapeDtypeStruct((nq, K), jnp.float32),
            jax.ShapeDtypeStruct((13, K), jnp.float32),
            jax.ShapeDtypeStruct((T, K), jnp.float32),
            jax.ShapeDtypeStruct((nq * 3, K), jnp.float32),
            jax.ShapeDtypeStruct((nq * 4, K), jnp.float32),
        ),
        interpret=True,
    )(q.T, v.T, ctrl.T, cube13.T)

    def ref_one(qi, vi, ci, cb):
        s = SimState(
            qpos=qi, qvel=vi, ctrl=ci, cube_pos=cb[:3], cube_quat=cb[3:7],
            cube_linvel=cb[7:10], cube_angvel=cb[10:13], time=jnp.zeros(()),
        )
        s2, (tch, xpos, xquat) = _substep_jnp(m, s, dt, True, True, implicit)
        return (
            s2.qpos, s2.qvel,
            jnp.concatenate([s2.cube_pos, s2.cube_quat, s2.cube_linvel, s2.cube_angvel]),
            tch, xpos, xquat,
        )

    r = jax.vmap(ref_one)(q, v, ctrl, cube13)
    np.testing.assert_allclose(np.asarray(qo.T), np.asarray(r[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vo.T), np.asarray(r[1]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(co.T), np.asarray(r[2]), atol=1e-4)
    assert bool(jnp.all((touch.T > 0.5) == r[3]))
    np.testing.assert_allclose(
        np.asarray(xp.T.reshape(K, nq, 3)), np.asarray(r[4]), atol=1e-5
    )


# ---------------------------------------------------------------------------
# Fused rollout+cost megakernel (ops/pallas_substep.rollout_pick_costs):
# the whole (K, H) rollout+cost sweep in ONE kernel launch.
# ---------------------------------------------------------------------------


def _pick_oracle(model, state0, U, n_substeps=1, dt=0.02):
    from gym_kmanip_tpu.mpc.cost import CostParams, cube_pick_cost
    from gym_kmanip_tpu.mpc.rollout import rollout

    params = CostParams()
    cost_fn = lambda s, aux, u: cube_pick_cost(model, s, aux, u, params)
    return jax.vmap(
        lambda u: rollout(model, state0, u, cost_fn, n_substeps=n_substeps, dt=dt)[0]
    )(U)


def _rand_seqs(model, K, H, scale, seed):
    key = jax.random.PRNGKey(seed)
    base = jnp.asarray(model.home_qpos[: model.nu], jnp.float32)
    return base[None, None, :] + scale * jax.random.normal(
        key, (K, H, model.nu), dtype=jnp.float32
    )


def test_rollout_pick_megakernel_single_step_exact():
    """H=1 isolates the cost terms from trajectory rounding amplification:
    totals must match cube_pick_cost through mpc_step to f32 rounding even
    for wild candidates that slam limits and graze contacts."""
    from gym_kmanip_tpu.dynamics.state import init_state
    from gym_kmanip_tpu.models import get_model
    from gym_kmanip_tpu.ops.pallas_substep import PickCostSpec, rollout_pick_costs

    m = get_model("solo_arm")
    s0 = init_state(m)
    U = _rand_seqs(m, 32, 1, 0.2, seed=3)
    oracle = _pick_oracle(m, s0, U)
    got = rollout_pick_costs(m, U, s0, PickCostSpec(), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle), atol=1e-5)


def test_rollout_pick_megakernel_horizon_env_fidelity():
    """Multi-step totals at env fidelity (n_substeps=2, dt=0.002) match the
    vmap(rollout) oracle tightly (contact forces are mild per 2 ms substep,
    so f32 row-math rounding does not amplify)."""
    from gym_kmanip_tpu.dynamics.state import init_state
    from gym_kmanip_tpu.models import get_model
    from gym_kmanip_tpu.ops.pallas_substep import PickCostSpec, rollout_pick_costs

    m = get_model("solo_arm")
    s0 = init_state(m)
    U = _rand_seqs(m, 4, 3, 0.05, seed=1)
    oracle = _pick_oracle(m, s0, U, n_substeps=2, dt=0.002)
    got = rollout_pick_costs(
        m, U, s0, PickCostSpec(), n_substeps=2, dt=0.002, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle), atol=1e-4)


def test_rollout_pick_megakernel_grid_path():
    """K > block_k tiles the batch over a 1-D grid; totals still match
    (block boundaries, edge-padding lanes discarded)."""
    from gym_kmanip_tpu.dynamics.state import init_state
    from gym_kmanip_tpu.models import get_model
    from gym_kmanip_tpu.ops.pallas_substep import PickCostSpec, rollout_pick_costs

    m = get_model("solo_arm")
    s0 = init_state(m)
    U = _rand_seqs(m, 140, 2, 0.05, seed=2)
    oracle = _pick_oracle(m, s0, U)
    got = rollout_pick_costs(
        m, U, s0, PickCostSpec(), interpret=True, block_k=128
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle), atol=1e-3)


def test_fused_pick_solver_matches_plain_mppi():
    """make_fused_pick_solver is the SAME MPPI solve as make_mppi_solver
    with cube_pick_cost — same elite choice, near-identical control out."""
    from gym_kmanip_tpu.dynamics.state import init_state
    from gym_kmanip_tpu.models import get_model
    from gym_kmanip_tpu.mpc.cost import CostParams, cube_pick_cost
    from gym_kmanip_tpu.mpc.mppi import (
        MPPIConfig,
        init_mppi,
        make_fused_pick_solver,
        make_mppi_solver,
    )

    m = get_model("solo_arm")
    cfg = MPPIConfig(horizon=4, n_samples=16, n_iters=1)
    params = CostParams()
    cost_fn = lambda s, aux, u: cube_pick_cost(m, s, aux, u, params)
    plain = make_mppi_solver(m, cfg, cost_fn)
    fused = make_fused_pick_solver(m, cfg, interpret=True)

    ms, ss = init_mppi(m, cfg), init_state(m)
    ms_p, u0_p, J_p = plain(ms, ss)
    ms_f, u0_f, J_f = fused(ms, ss)
    np.testing.assert_allclose(np.asarray(u0_f), np.asarray(u0_p), atol=1e-5)
    np.testing.assert_allclose(float(J_f), float(J_p), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ms_f.nominal), np.asarray(ms_p.nominal), atol=1e-5
    )


def test_rollout_feedback_megakernel_matches_scan_forward():
    """The feedback-rollout megakernel (iLQR line-search forward in one
    launch) must reproduce the scan-path forward: u = clip(u_nom + a*k +
    K(x - x_nom)), x' = f_fast(x, u), reduced layout, for several alphas
    including 0 (pure nominal replay) and 1."""
    from gym_kmanip_tpu.dynamics.state import init_state
    from gym_kmanip_tpu.models import get_model
    from gym_kmanip_tpu.mpc.rollout import mpc_step
    from gym_kmanip_tpu.ops.pallas_substep import rollout_feedback
    from gym_kmanip_tpu.solvers.ilqr import flatten_state, unflatten_state

    m = get_model("solo_arm")
    s0 = init_state(m)
    H, n, nu = 6, 2 * m.nq, m.nu
    rng = np.random.RandomState(5)
    x0 = flatten_state(s0, reduced=True)
    home = np.asarray(m.home_qpos[:nu], np.float32)
    us_nom = jnp.asarray(
        home[None] + 0.05 * rng.randn(H, nu), jnp.float32
    )
    xs_nom = jnp.asarray(
        np.asarray(x0)[None] + 0.02 * rng.randn(H, n), jnp.float32
    )
    ks = jnp.asarray(0.03 * rng.randn(H, nu), jnp.float32)
    Ks = jnp.asarray(0.05 * rng.randn(H, nu, n), jnp.float32)
    alphas = jnp.asarray([0.0, 0.3, 1.0], jnp.float32)
    lo = jnp.asarray(m.ctrl_range[:, 0], jnp.float32)
    hi = jnp.asarray(m.ctrl_range[:, 1], jnp.float32)

    def f_fast(x, u):
        s = unflatten_state(m, x, s0)
        s2, _ = mpc_step(m, s, u, 1, 0.02, contact=False,
                         unrolled_solve=True)
        return flatten_state(s2, reduced=True)

    def forward(alpha):
        def body(x, inp):
            x_nom, u_nom, kff, K = inp
            u = jnp.clip(u_nom + alpha * kff + K @ (x - x_nom), lo, hi)
            x2 = jax.vmap(f_fast)(x[None], u[None])[0]
            return x2, (x2, u)

        _, (xs_t, us_t) = jax.lax.scan(body, x0, (xs_nom, us_nom, ks, Ks))
        return xs_t, us_t

    xs_ref = []
    us_ref = []
    for a in np.asarray(alphas):
        xs_t, us_t = jax.jit(forward)(jnp.float32(a))
        xs_ref.append(np.asarray(xs_t))
        us_ref.append(np.asarray(us_t))

    cube0 = jnp.concatenate(
        [s0.cube_pos, s0.cube_quat, s0.cube_linvel, s0.cube_angvel]
    )
    xs_k, us_k = rollout_feedback(
        m, x0, cube0, xs_nom, us_nom, ks, Ks, alphas, n_substeps=1,
        dt=0.02, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(us_k), np.stack(us_ref), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(xs_k), np.stack(xs_ref), atol=5e-4, rtol=1e-3
    )
