"""Kinematic bicycle model: RK2 (midpoint) discrete dynamics + Jacobians.

State  x = [x, y, theta, v, a, delta]   (6)
Control u = [jerk, delta_rate]          (2)

Replaces /root/reference/algorithm/ilqr/vehicle_model.{h,cc} with pure jnp
functions that vmap over the horizon and batch axes.

Two Jacobian modes:
  * ``analytic`` — replicates the reference's hand-derived midpoint-scheme
    Jacobians (vehicle_model.cc:44-86) EXACTLY, including the quirk that
    rows A[2,5] and B[2,1] use ``v`` where the true midpoint derivative uses
    ``v + 0.5*dt*a`` (v_mid). Needed for <1e-3 control parity at equal
    iteration budget.
  * ``autodiff`` — jax.jacfwd of the actual RK2 step (exact derivative).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .geometry import normalize_angle

STATE_DIM = 6
CONTROL_DIM = 2


def dynamics_continuous(state, control, wheel_base):
    """Continuous-time bicycle ODE (vehicle_model.cc:123-138). Works on
    [..., 6] / [..., 2] arrays."""
    theta = normalize_angle(state[..., 2])
    v = state[..., 3]
    a = state[..., 4]
    delta = normalize_angle(state[..., 5])
    return jnp.stack([
        v * jnp.cos(theta),
        v * jnp.sin(theta),
        v * jnp.tan(delta) / wheel_base,
        a,
        control[..., 0],
        control[..., 1],
    ], axis=-1)


def dynamics_rk2(state, control, dt, wheel_base):
    """Midpoint (RK2) discrete step with angle wrap on theta/delta
    (vehicle_model.cc:107-121)."""
    k1 = dynamics_continuous(state, control, wheel_base)
    mid = state + 0.5 * dt * k1
    k2 = dynamics_continuous(mid, control, wheel_base)
    nxt = state + dt * k2
    nxt = nxt.at[..., 2].set(normalize_angle(nxt[..., 2]))
    nxt = nxt.at[..., 5].set(normalize_angle(nxt[..., 5]))
    return nxt


def dynamics_jacobian_analytic(state, control, dt, wheel_base):
    """Reference-parity analytic Jacobians of the midpoint scheme
    (vehicle_model.cc:44-86). Returns (A [..., 6, 6], B [..., 6, 2])."""
    L = wheel_base
    v = state[..., 3]
    theta = normalize_angle(state[..., 2])
    delta = normalize_angle(state[..., 5])
    a = state[..., 4]
    delta_rate = control[..., 1]

    theta_mid = theta + 0.5 * dt * v * jnp.tan(delta) / L
    tan_delta = jnp.tan(delta)
    tan_delta_rate = jnp.tan(delta + 0.5 * dt * delta_rate)
    cos_tm = jnp.cos(theta_mid)
    sin_tm = jnp.sin(theta_mid)
    td2 = tan_delta * tan_delta
    tdr2 = tan_delta_rate * tan_delta_rate
    v_mid = 0.5 * a * dt + v
    # NOTE: the reference uses plain v (not v_mid) in these two terms
    # (vehicle_model.cc:59,82) — kept for parity.
    v_tdr = v * (tdr2 + 1.0)

    z = jnp.zeros_like(v)
    o = jnp.ones_like(v)
    dt_ = dt
    A = jnp.stack([
        jnp.stack([o, z, -dt_ * v_mid * sin_tm,
                   dt_ * cos_tm - 0.5 * dt_ * dt_ * v_mid * sin_tm * tan_delta / L,
                   0.5 * dt_ * dt_ * cos_tm,
                   -0.5 * dt_ * dt_ * v * v_mid * (td2 + 1.0) * sin_tm / L], axis=-1),
        jnp.stack([z, o, dt_ * v_mid * cos_tm,
                   dt_ * sin_tm + 0.5 * dt_ * dt_ * v_mid * cos_tm * tan_delta / L,
                   0.5 * dt_ * dt_ * sin_tm,
                   0.5 * dt_ * dt_ * v * v_mid * (td2 + 1.0) * cos_tm / L], axis=-1),
        jnp.stack([z, z, o,
                   dt_ * tan_delta_rate / L,
                   0.5 * dt_ * dt_ * tan_delta_rate / L,
                   dt_ * v_tdr / L], axis=-1),
        jnp.stack([z, z, z, o, dt_ * o, z], axis=-1),
        jnp.stack([z, z, z, z, o, z], axis=-1),
        jnp.stack([z, z, z, z, z, o], axis=-1),
    ], axis=-2)

    B = jnp.stack([
        jnp.stack([z, z], axis=-1),
        jnp.stack([z, z], axis=-1),
        jnp.stack([z, 0.5 * dt_ * dt_ * v * (tdr2 + 1.0) / L], axis=-1),
        jnp.stack([0.5 * dt_ * dt_ * o, z], axis=-1),
        jnp.stack([dt_ * o, z], axis=-1),
        jnp.stack([z, dt_ * o], axis=-1),
    ], axis=-2)
    return A, B


def dynamics_jacobian_autodiff(state, control, dt, wheel_base):
    """Exact Jacobians of the RK2 step via forward-mode autodiff; vmaps over
    leading axes."""
    def step(x, u):
        return dynamics_rk2(x, u, dt, wheel_base)

    jac = jax.jacfwd(step, argnums=(0, 1))

    flat_s = state.reshape((-1, STATE_DIM))
    flat_c = control.reshape((-1, CONTROL_DIM))
    A, B = jax.vmap(jac)(flat_s, flat_c)
    A = A.reshape(state.shape[:-1] + (STATE_DIM, STATE_DIM))
    B = B.reshape(state.shape[:-1] + (STATE_DIM, CONTROL_DIM))
    return A, B


def dynamics_jacobian(state, control, dt, wheel_base, mode: str = "analytic"):
    if mode == "analytic":
        return dynamics_jacobian_analytic(state, control, dt, wheel_base)
    elif mode == "autodiff":
        return dynamics_jacobian_autodiff(state, control, dt, wheel_base)
    raise ValueError(f"unknown jacobian mode {mode!r}")


def rollout(x0, us, dt, wheel_base):
    """Open-loop rollout: x0 [6], us [T, 2] -> xs [T+1, 6] via lax.scan."""
    def step(x, u):
        nxt = dynamics_rk2(x, u, dt, wheel_base)
        return nxt, nxt

    _, xs = jax.lax.scan(step, x0, us)
    return jnp.concatenate([x0[None], xs], axis=0)
