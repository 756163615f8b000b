"""Penalty-based contact model: cube-table, fingertip-cube, fingertip-table.

TPU-native replacement for MuJoCo's soft-constraint contact solve (the
reference cube's solref/solimp/condim=4 spec at
/root/reference/gym_kmanip/assets/scene.xml:20 and the contact scan at
env_sim.py:163-178).

Design: the contact *set* is static -- 8 cube corners vs the table plane,
plus every fingertip sphere vs the cube box and vs the table plane -- so all
shapes are fixed and the whole model is one fused elementwise block under
jit/vmap. Activation is by smooth max(0, penetration) gating, not by
data-dependent branching, which keeps XLA happy and the model differentiable
for gradient-based MPC.

Forces follow the regularized spring-damper + smooth Coulomb form:
  f_n = max(0, kn * pen - cn * v_n)          (v_n < 0 approaching)
  f_t = -mu * f_n * v_t / sqrt(|v_t|^2 + v_slip^2)
"""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gym_kmanip_tpu import constants as k
from gym_kmanip_tpu.utils import rotations as rot

# 8 cube corner offsets in the cube frame, scaled by half-size
_CORNERS = jnp.array(
    [
        [sx, sy, sz]
        for sx in (-1.0, 1.0)
        for sy in (-1.0, 1.0)
        for sz in (-1.0, 1.0)
    ]
)


class ContactOut(NamedTuple):
    force_cube: jax.Array  # (3,) net world force on the cube
    torque_cube: jax.Array  # (3,) net world torque about the cube COM
    tip_forces: jax.Array  # (n_tips, 3) world force on each fingertip
    touch_tip: jax.Array  # (n_tips,) bool fingertip-cube contact
    touch_table: jax.Array  # () bool cube-table contact


def _normal_force(pen: jax.Array, vn: jax.Array) -> jax.Array:
    """Spring-damper normal force magnitude, active only in penetration."""
    raw = k.CONTACT_STIFFNESS * pen - k.CONTACT_DAMPING * vn
    return jnp.where(pen > 0, jnp.maximum(raw, 0.0), 0.0)


def _friction(fn: jax.Array, vt: jax.Array) -> jax.Array:
    """Smooth Coulomb friction force (world), vt: (..., 3)."""
    speed = jnp.sqrt(jnp.sum(vt * vt, axis=-1, keepdims=True) + k.CONTACT_SLIP_VEL**2)
    return -k.CONTACT_FRICTION_MU * fn[..., None] * vt / speed


def _over_table(p: jax.Array) -> jax.Array:
    """Bool: world point is horizontally above the tabletop box."""
    return (jnp.abs(p[..., 0] - k.TABLE_POS[0]) < k.TABLE_HALF_X) & (
        jnp.abs(p[..., 1] - k.TABLE_POS[1]) < k.TABLE_HALF_Y
    )


def cube_table(
    cube_pos: jax.Array,
    cube_quat: jax.Array,
    cube_linvel: jax.Array,
    cube_angvel: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Corner-vs-plane contact of the cube with the tabletop (and the floor
    at z=0 when the cube is off the table).

    Returns (force, torque, touching) on/about the cube COM.
    """
    R = rot.quat_to_mat(cube_quat)
    corners_w = cube_pos + (_CORNERS.astype(cube_pos.dtype) * k.CUBE_HALF_SIZE) @ R.T
    arm = corners_w - cube_pos  # (8,3)
    v_corner = cube_linvel + jnp.cross(cube_angvel, arm)  # (8,3)

    over = _over_table(corners_w)
    plane_z = jnp.where(over, k.TABLE_TOP_Z, 0.0)
    pen = plane_z - corners_w[:, 2]  # (8,)
    vn = v_corner[:, 2]
    fn = _normal_force(pen, vn)  # (8,)
    vt = v_corner.at[:, 2].set(0.0)
    ft = _friction(fn, vt)  # (8,3)
    f = ft.at[:, 2].add(fn)  # (8,3)

    force = jnp.sum(f, axis=0)
    torque = jnp.sum(jnp.cross(arm, f), axis=0)
    touching = jnp.any((pen > 0) & over)
    return force, torque, touching


def sphere_box(
    center_local: jax.Array, radius: float, half: float
) -> Tuple[jax.Array, jax.Array]:
    """Sphere vs origin-centered box in the box frame.

    Returns (pen, normal_local): penetration depth (>0 touching) and the
    contact normal pointing from the box surface toward the sphere center.
    Handles the center-inside-box case by pushing out along the closest face.
    """
    clamped = jnp.clip(center_local, -half, half)
    delta = center_local - clamped
    # double-where safe norm: delta == 0 whenever the center is inside the
    # box, and norm's NaN derivative there would leak through `where` into
    # iLQR's jacfwd of in-contact states
    sq = jnp.sum(delta * delta)
    outside = sq > 1e-18
    dist = jnp.sqrt(jnp.where(outside, sq, 1.0))

    # outside: usual closest-point normal
    n_out = delta / dist
    pen_out = radius - dist

    # inside: exit through the face with the smallest remaining distance
    face_dist = half - jnp.abs(center_local)  # (3,) >= 0 when inside
    axis = jnp.argmin(face_dist)
    sign = jnp.sign(center_local[axis] + 1e-12)
    n_in = jnp.zeros(3, dtype=center_local.dtype).at[axis].set(sign)
    pen_in = radius + face_dist[axis]

    pen = jnp.where(outside, pen_out, pen_in)
    normal = jnp.where(outside, n_out, n_in)
    return pen, normal


def fingertips_cube_table(
    tip_pos: jax.Array,  # (T,3) world fingertip sphere centers
    tip_vel: jax.Array,  # (T,3) world velocities
    tip_radius: jax.Array,  # (T,)
    cube_pos: jax.Array,
    cube_quat: jax.Array,
    cube_linvel: jax.Array,
    cube_angvel: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fingertip spheres vs the cube box and the table plane.

    Returns (tip_forces (T,3), cube_force (3,), cube_torque (3,),
    touch (T,) bool tip-cube contact).
    """
    R = rot.quat_to_mat(cube_quat)

    def one_tip(p, v, r):
        local = R.T @ (p - cube_pos)
        pen, n_local = sphere_box(local, r, k.CUBE_HALF_SIZE)
        n = R @ n_local  # world, cube -> tip
        cpoint = p - n * (r - jnp.maximum(pen, 0.0) * 0.5)
        arm = cpoint - cube_pos
        v_cube_pt = cube_linvel + jnp.cross(cube_angvel, arm)
        v_rel = v - v_cube_pt
        vn = jnp.dot(v_rel, n)
        fn = _normal_force(pen, vn)
        vt = v_rel - vn * n
        f_tip = fn * n + _friction(fn, vt)

        # tip vs table plane (prevents driving the gripper through the top)
        plane_z = jnp.where(_over_table(p), k.TABLE_TOP_Z, 0.0)
        pen_t = plane_z - (p[2] - r)
        fn_t = _normal_force(pen_t, v[2])
        vt_t = v.at[2].set(0.0)
        f_tip = f_tip + jnp.array([0.0, 0, 1.0], dtype=p.dtype) * fn_t + _friction(
            fn_t, vt_t
        )

        return f_tip, -fn * n - _friction(fn, vt), arm, pen > 0

    f_tips, f_cubes, arms, touch = jax.vmap(one_tip)(tip_pos, tip_vel, tip_radius)
    cube_force = jnp.sum(f_cubes, axis=0)
    cube_torque = jnp.sum(jnp.cross(arms, f_cubes), axis=0)
    return f_tips, cube_force, cube_torque, touch


_CONTACT_CV_CACHE = {}


def contact_forces_fast(model, tip_pos, tip_vel, cube_pos, cube_quat,
                        cube_linvel, cube_angvel) -> ContactOut:
    """`contact_forces` with a custom_vmap seam: per-item calls run the jnp
    path below; under vmap on TPU the whole rollout batch dispatches to the
    fused Pallas kernel (ops/pallas_contacts). Fingertip radii come from
    the static model."""
    key = id(model)
    if key not in _CONTACT_CV_CACHE:
        import numpy as _np

        radii = _np.asarray([t.radius for t in model.fingertips], dtype=_np.float32)

        @jax.custom_batching.custom_vmap
        def f(tp, tv, cp, cq, clv, cav):
            return contact_forces(tp, tv, jnp.asarray(radii, dtype=tp.dtype),
                                  cp, cq, clv, cav)

        @f.def_vmap
        def _rule(axis_size, in_batched, tp, tv, cp, cq, clv, cav):
            args = []
            for a, b in zip((tp, tv, cp, cq, clv, cav), in_batched):
                args.append(a if b else jnp.broadcast_to(a, (axis_size,) + a.shape))
            tp, tv, cp, cq, clv, cav = args
            batched_flags = ContactOut(True, True, True, True, True)
            if jax.default_backend() == "tpu" and tp.ndim == 3:
                from gym_kmanip_tpu.ops.pallas_contacts import contact_forces_batched

                return contact_forces_batched(model, tp, tv, cp, cq, clv, cav), batched_flags
            out = jax.vmap(
                lambda a, b, c, d, e, g: contact_forces(
                    a, b, jnp.asarray(radii, dtype=a.dtype), c, d, e, g
                )
            )(tp, tv, cp, cq, clv, cav)
            return out, batched_flags

        _CONTACT_CV_CACHE[key] = f
    return _CONTACT_CV_CACHE[key](
        tip_pos, tip_vel, cube_pos, cube_quat, cube_linvel, cube_angvel
    )


def contact_forces(
    tip_pos: jax.Array,
    tip_vel: jax.Array,
    tip_radius: jax.Array,
    cube_pos: jax.Array,
    cube_quat: jax.Array,
    cube_linvel: jax.Array,
    cube_angvel: jax.Array,
) -> ContactOut:
    """All contact forces for one world state."""
    f_table, t_table, touch_table = cube_table(
        cube_pos, cube_quat, cube_linvel, cube_angvel
    )
    f_tips, f_cube, t_cube, touch = fingertips_cube_table(
        tip_pos, tip_vel, tip_radius, cube_pos, cube_quat, cube_linvel, cube_angvel
    )
    return ContactOut(
        force_cube=f_table + f_cube,
        torque_cube=t_table + t_cube,
        tip_forces=f_tips,
        touch_tip=touch,
        touch_table=touch_table,
    )
