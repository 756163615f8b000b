"""Numpy prototype of a Trust-Region-Reflective (Branch-Coleman-Li / STIR)
bounded least-squares solver, semantics-compatible with scipy.optimize
least_squares(method='trf', tr_solver='exact', x_scale=1).

Goal: reproduce scipy's per-step IK solutions on the reference problem
EXACTLY -- including its early xtol exits under trust-radius collapse, which
is where a plain LM diverges from it (the t=4 event in exp_ik_parity).
If this matches, the JAX port gives near-exact env parity.
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
from functools import partial

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from numpy.linalg import norm
from scipy.optimize import least_squares

from gym_kmanip_tpu import constants as k
from gym_kmanip_tpu.solvers.ik import _residual
from tools.exp_ik_parity import MODEL, MASK, Q_MASK, SITE, ee_pose, ref_jacobian

EPS = np.finfo(float).eps


# ---- helpers (STIR algorithm, matching scipy.optimize._lsq semantics) ----

def cl_scaling_vector(x, g, lb, ub):
    v = np.ones_like(x)
    dv = np.zeros_like(x)
    m1 = (g < 0) & np.isfinite(ub)
    v[m1] = ub[m1] - x[m1]
    dv[m1] = -1
    m2 = (g > 0) & np.isfinite(lb)
    v[m2] = x[m2] - lb[m2]
    dv[m2] = 1
    return v, dv


def in_bounds(x, lb, ub):
    return np.all((x >= lb) & (x <= ub))


def step_size_to_bound(x, s, lb, ub):
    nz = np.nonzero(s)
    steps = np.full_like(x, np.inf)
    with np.errstate(over="ignore"):
        steps[nz] = np.maximum((lb - x)[nz] / s[nz], (ub - x)[nz] / s[nz])
    min_step = np.min(steps)
    return min_step, np.equal(steps, min_step) * np.sign(s).astype(int)


def find_active_constraints(x, lb, ub, rtol=1e-10):
    active = np.zeros_like(x, dtype=int)
    if rtol == 0:
        active[x <= lb] = -1
        active[x >= ub] = 1
        return active
    lower_dist = x - lb
    upper_dist = ub - x
    lower_thr = rtol * np.maximum(1, np.abs(lb))
    upper_thr = rtol * np.maximum(1, np.abs(ub))
    la = np.isfinite(lb) & (lower_dist <= np.minimum(upper_dist, lower_thr))
    active[la] = -1
    ua = np.isfinite(ub) & (upper_dist <= np.minimum(lower_dist, upper_thr))
    active[ua] = 1
    return active


def make_strictly_feasible(x, lb, ub, rstep=1e-10):
    x_new = x.copy()
    active = find_active_constraints(x, lb, ub, rstep)
    lm = active == -1
    um = active == 1
    if rstep == 0:
        x_new[lm] = np.nextafter(lb[lm], ub[lm])
        x_new[um] = np.nextafter(ub[um], lb[um])
    else:
        x_new[lm] = lb[lm] + rstep * np.maximum(1, np.abs(lb[lm]))
        x_new[um] = ub[um] - rstep * np.maximum(1, np.abs(ub[um]))
    tight = (x_new < lb) | (x_new > ub)
    x_new[tight] = 0.5 * (lb[tight] + ub[tight])
    return x_new


def intersect_trust_region(x, s, Delta):
    a = np.dot(s, s)
    b = np.dot(x, s)
    c = np.dot(x, x) - Delta**2
    d = np.sqrt(b * b - a * c)
    q = -(b + np.copysign(d, b))
    t1 = q / a
    t2 = c / q
    return (t1, t2) if t1 < t2 else (t2, t1)


def solve_lsq_trust_region(n, m, uf, s, V, Delta, initial_alpha=None,
                           rtol=0.01, max_iter=10):
    def phi_and_derivative(alpha):
        denom = s**2 + alpha
        p_norm = norm(suf / denom)
        phi = p_norm - Delta
        phi_prime = -np.sum(suf**2 / denom**3) / p_norm
        return phi, phi_prime

    suf = s * uf
    if m >= n:
        threshold = EPS * m * s[0]
        full_rank = s[-1] > threshold
    else:
        full_rank = False

    if full_rank:
        p = -V.dot(uf / s)
        if norm(p) <= Delta:
            return p, 0.0, 0

    alpha_upper = norm(suf) / Delta
    if full_rank:
        phi, phi_prime = phi_and_derivative(0.0)
        alpha_lower = -phi / phi_prime
    else:
        alpha_lower = 0.0

    if initial_alpha is None or not full_rank and initial_alpha == 0:
        alpha = max(0.001 * alpha_upper, (alpha_lower * alpha_upper) ** 0.5)
    else:
        alpha = initial_alpha

    for it in range(max_iter):
        if alpha < alpha_lower or alpha > alpha_upper:
            alpha = max(0.001 * alpha_upper, (alpha_lower * alpha_upper) ** 0.5)
        phi, phi_prime = phi_and_derivative(alpha)
        if phi < 0:
            alpha_upper = alpha
        ratio = phi / phi_prime
        alpha_lower = max(alpha_lower, alpha - ratio)
        alpha -= (phi + Delta) * ratio / Delta
        if np.abs(phi) < rtol * Delta:
            break

    p = -V.dot(suf / (s**2 + alpha))
    p *= Delta / norm(p)
    return p, alpha, it + 1


def build_quadratic_1d(J, g, s, diag=None, s0=None):
    v = J.dot(s)
    a = np.dot(v, v)
    if diag is not None:
        a += np.dot(s * diag, s)
    a *= 0.5
    b = np.dot(g, s)
    if s0 is not None:
        u = J.dot(s0)
        b += np.dot(u, v)
        c = 0.5 * np.dot(u, u) + np.dot(g, s0)
        if diag is not None:
            b += np.dot(s0 * diag, s)
            c += 0.5 * np.dot(s0 * diag, s0)
        return a, b, c
    return a, b


def minimize_quadratic_1d(a, b, lb, ub, c=0):
    t = [lb, ub]
    if a != 0:
        extremum = -0.5 * b / a
        if lb < extremum < ub:
            t.append(extremum)
    t = np.asarray(t)
    y = t * (a * t + b) + c
    i = np.argmin(y)
    return t[i], y[i]


def evaluate_quadratic(J, g, s, diag=None):
    Js = J.dot(s)
    q = np.dot(Js, Js)
    if diag is not None:
        q += np.dot(s * diag, s)
    return 0.5 * q + np.dot(s, g)


def update_tr_radius(Delta, actual, predicted, step_norm, bound_hit):
    if predicted > 0:
        ratio = actual / predicted
    elif predicted == actual == 0:
        ratio = 1
    else:
        ratio = 0
    if ratio < 0.25:
        Delta = 0.25 * step_norm
    elif ratio > 0.75 and bound_hit:
        Delta *= 2.0
    return Delta, ratio


def check_termination(dF, F, dx_norm, x_norm, ratio, ftol, xtol):
    ftol_ok = dF < ftol * F and ratio > 0.25
    xtol_ok = dx_norm < xtol * (xtol + x_norm)
    if ftol_ok and xtol_ok:
        return 4
    if ftol_ok:
        return 2
    if xtol_ok:
        return 3
    return None


def select_step(x, J_h, diag_h, g_h, p, p_h, d, Delta, lb, ub, theta):
    if in_bounds(x + p, lb, ub):
        p_value = evaluate_quadratic(J_h, g_h, p_h, diag=diag_h)
        return p, p_h, -p_value

    p_stride, hits = step_size_to_bound(x, p, lb, ub)

    r_h = np.copy(p_h)
    r_h[hits.astype(bool)] *= -1
    r = d * r_h

    p = p * p_stride
    p_h = p_h * p_stride
    x_on_bound = x + p

    _, to_tr = intersect_trust_region(p_h, r_h, Delta)
    to_bound, _ = step_size_to_bound(x_on_bound, r, lb, ub)

    r_stride = min(to_bound, to_tr)
    if r_stride > 0:
        r_stride_l = (1 - theta) * p_stride / r_stride
        r_stride_u = theta * to_bound if r_stride == to_bound else to_tr
    else:
        r_stride_l = 0
        r_stride_u = -1

    if r_stride_l <= r_stride_u:
        a, b, c = build_quadratic_1d(J_h, g_h, r_h, s0=p_h, diag=diag_h)
        r_stride, r_value = minimize_quadratic_1d(a, b, r_stride_l, r_stride_u, c=c)
        r_h = r_h * r_stride + p_h
        r = r_h * d
    else:
        r_value = np.inf

    p = p * theta
    p_h = p_h * theta
    p_value = evaluate_quadratic(J_h, g_h, p_h, diag=diag_h)

    ag_h = -g_h
    ag = d * ag_h
    to_tr = Delta / norm(ag_h)
    to_bound, _ = step_size_to_bound(x, ag, lb, ub)
    ag_stride_max = theta * to_bound if to_bound < to_tr else to_tr
    a, b = build_quadratic_1d(J_h, g_h, ag_h, diag=diag_h)
    ag_stride, ag_value = minimize_quadratic_1d(a, b, 0, ag_stride_max)
    ag_h = ag_h * ag_stride
    ag = ag * ag_stride

    if p_value < r_value and p_value < ag_value:
        return p, p_h, -p_value
    if r_value < p_value and r_value < ag_value:
        return r, r_h, -r_value
    return ag, ag_h, -ag_value


def trf_bounds_replica(fun, jac, x0, lb, ub, ftol=1e-8, xtol=1e-8, gtol=1e-8,
                       max_nfev=None):
    x = make_strictly_feasible(np.asarray(x0, float), lb, ub, rstep=1e-10)
    f = fun(x)
    nfev = 1
    J = jac(x)
    m, n = J.shape
    cost = 0.5 * np.dot(f, f)
    g = J.T.dot(f)

    v, dv = cl_scaling_vector(x, g, lb, ub)
    Delta = norm(x / v**0.5)
    if Delta == 0:
        Delta = 1.0

    if max_nfev is None:
        max_nfev = x.size * 100

    alpha = 0.0
    termination_status = None

    while True:
        v, dv = cl_scaling_vector(x, g, lb, ub)
        g_norm = norm(g * v, ord=np.inf)
        if g_norm < gtol:
            termination_status = 1
        if termination_status is not None or nfev == max_nfev:
            break

        d = v**0.5
        diag_h = g * dv
        g_h = d * g

        f_augmented = np.concatenate([f, np.zeros(n)])
        J_augmented = np.vstack([J * d, np.diag(diag_h**0.5)])
        J_h = J_augmented[:m]
        U, s, V_svd = np.linalg.svd(J_augmented, full_matrices=False)
        V_svd = V_svd.T
        uf = U.T.dot(f_augmented)

        theta = max(0.995, 1 - g_norm)

        actual_reduction = -1
        while actual_reduction <= 0 and nfev < max_nfev:
            p_h, alpha, _ = solve_lsq_trust_region(
                n, m, uf, s, V_svd, Delta, initial_alpha=alpha)
            p = d * p_h
            step, step_h, predicted_reduction = select_step(
                x, J_h, diag_h, g_h, p, p_h, d, Delta, lb, ub, theta)
            x_new = make_strictly_feasible(x + step, lb, ub, rstep=0)
            f_new = fun(x_new)
            nfev += 1
            step_h_norm = norm(step_h)
            if not np.all(np.isfinite(f_new)):
                Delta = 0.25 * step_h_norm
                continue
            cost_new = 0.5 * np.dot(f_new, f_new)
            actual_reduction = cost - cost_new
            Delta_new, ratio = update_tr_radius(
                Delta, actual_reduction, predicted_reduction,
                step_h_norm, step_h_norm > 0.95 * Delta)
            step_norm = norm(step)
            termination_status = check_termination(
                actual_reduction, cost, step_norm, norm(x), ratio, ftol, xtol)
            if termination_status is not None:
                break
            alpha *= Delta / Delta_new
            Delta = Delta_new

        if actual_reduction > 0:
            x = x_new
            f = f_new
            cost = cost_new
            J = jac(x)
            g = J.T.dot(f)

    if termination_status is None:
        termination_status = 0
    return x, termination_status, nfev


def main():
    q_full = jnp.asarray(MODEL.home_qpos, dtype=jnp.float32)
    lo = np.asarray(MODEL.jnt_range[list(Q_MASK), 0], float)
    hi = np.asarray(MODEL.jnt_range[list(Q_MASK), 1], float)
    rng = np.random.RandomState(0)

    states = {"A": q_full, "R": q_full}
    prevs = {kk: q_full for kk in states}
    p0, quat0 = ee_pose(q_full)
    goal = np.asarray(p0)

    max_ar = 0.0
    for t in range(20):
        goal = goal + rng.uniform(-1, 1, 3) * k.EE_POS_DELTA
        g = jnp.asarray(goal, dtype=jnp.float32)
        sols = {}
        stat = {}
        for key in ("A", "R"):
            qf = states[key]
            res_fn = partial(
                _residual, MODEL, qpos_full=qf, goal_pos=g, goal_orn=quat0,
                q_home=q_full[MASK], q_prev=prevs[key][MASK],
                q_mask=Q_MASK, site_name=SITE,
            )
            np_res = lambda q: np.asarray(res_fn(jnp.asarray(q, jnp.float32)), np.float64)
            jf = lambda q: np.asarray(
                ref_jacobian(jnp.asarray(q, jnp.float32), qf, quat0), np.float64)
            if key == "A":
                r = least_squares(np_res, np.asarray(qf)[list(Q_MASK)], jac=jf,
                                  bounds=(lo, hi))
                sols[key] = r.x
                stat[key] = (r.status, r.nfev)
            else:
                xr, st, nf = trf_bounds_replica(
                    np_res, jf, np.asarray(qf)[list(Q_MASK)], lo, hi)
                sols[key] = xr
                stat[key] = (st, nf)
            prevs[key] = states[key]
            states[key] = states[key].at[MASK].set(jnp.asarray(sols[key], jnp.float32))
        dar = np.abs(sols["A"] - sols["R"]).max()
        max_ar = max(max_ar, dar)
        print(f"t={t:2d}  |A-R|={dar:.2e}   A(status,nfev)={stat['A']}  R={stat['R']}")

    print(f"\ncumulative max |A - replica| = {max_ar:.2e}")


if __name__ == "__main__":
    main()
