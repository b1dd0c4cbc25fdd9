"""ctypes bindings for the native CILQR reference solver (the parity oracle
and CPU baseline for bench comparisons)."""

from __future__ import annotations

import ctypes
from typing import NamedTuple

import numpy as np

from ..config import IlqrConfig, PlannerConfig, VehicleParam
from .build import build


class _Params(ctypes.Structure):
    _fields_ = [
        ("dt", ctypes.c_double),
        ("wheel_base", ctypes.c_double),
        ("max_velocity", ctypes.c_double),
        ("min_acceleration", ctypes.c_double),
        ("max_acceleration", ctypes.c_double),
        ("jerk_min", ctypes.c_double),
        ("jerk_max", ctypes.c_double),
        ("delta_min", ctypes.c_double),
        ("delta_max", ctypes.c_double),
        ("delta_rate_min", ctypes.c_double),
        ("delta_rate_max", ctypes.c_double),
        ("w_x", ctypes.c_double),
        ("w_y", ctypes.c_double),
        ("w_theta", ctypes.c_double),
        ("w_v", ctypes.c_double),
        ("w_a", ctypes.c_double),
        ("w_delta", ctypes.c_double),
        ("w_jerk", ctypes.c_double),
        ("w_delta_rate", ctypes.c_double),
        ("barrier_t", ctypes.c_double),
        ("barrier_eps", ctypes.c_double),
        ("num_of_disc", ctypes.c_int),
        ("veh_length", ctypes.c_double),
        ("rear_hang", ctypes.c_double),
        ("max_iter", ctypes.c_int),
        ("abs_cost_tol", ctypes.c_double),
        ("rel_cost_tol", ctypes.c_double),
    ]


def make_params(cfg: IlqrConfig, veh: VehicleParam, dt: float) -> _Params:
    w = cfg.weights
    return _Params(
        dt=dt, wheel_base=veh.wheel_base, max_velocity=veh.max_velocity,
        min_acceleration=veh.min_acceleration,
        max_acceleration=veh.max_acceleration,
        jerk_min=veh.jerk_min, jerk_max=veh.jerk_max,
        delta_min=veh.delta_min, delta_max=veh.delta_max,
        delta_rate_min=veh.delta_rate_min, delta_rate_max=veh.delta_rate_max,
        w_x=w.x_target, w_y=w.y_target, w_theta=w.theta, w_v=w.v, w_a=w.a,
        w_delta=w.delta, w_jerk=w.jerk, w_delta_rate=w.delta_rate,
        barrier_t=cfg.barrier.t, barrier_eps=cfg.barrier.epsilon,
        num_of_disc=cfg.num_of_disc, veh_length=veh.length,
        rear_hang=veh.rear_hang_length, max_iter=cfg.max_iter_num,
        abs_cost_tol=cfg.abs_cost_tol, rel_cost_tol=cfg.rel_cost_tol)


class RefSolveResult(NamedTuple):
    xs: np.ndarray
    us: np.ndarray
    status: int
    iters: int
    cost: np.ndarray  # [total, target, dynamic, corridor, lane]
    init_xs: np.ndarray
    init_us: np.ndarray


_lib = None


def load():
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(str(build()))
        dp = ctypes.POINTER(ctypes.c_double)
        u8 = ctypes.POINTER(ctypes.c_uint8)
        _lib.cilqr_ref_solve.restype = ctypes.c_int
        _lib.cilqr_ref_solve.argtypes = [
            dp, ctypes.c_int, dp, u8, ctypes.c_int,
            dp, dp, u8, ctypes.c_int,
            dp, dp, u8, ctypes.c_int,
            ctypes.POINTER(_Params), dp, dp,
            ctypes.POINTER(ctypes.c_int), dp, dp, dp]
        _lib.cilqr_ref_step.argtypes = [dp, dp, ctypes.POINTER(_Params), dp]
        _lib.cilqr_ref_jacobian.argtypes = [dp, dp, ctypes.POINTER(_Params),
                                            dp, dp]
    return _lib


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _u8ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def ref_solve(goals, corr_planes, corr_mask, left_planes, left_segs,
              left_mask, right_planes, right_segs, right_mask,
              cfg: IlqrConfig, veh: VehicleParam, dt: float) -> RefSolveResult:
    """Run the native oracle. goals[0] must already be the start state
    (transform_goals applied); constraints pre-shrunk+normalized."""
    lib = load()
    goals = np.ascontiguousarray(goals, np.float64)
    N = goals.shape[0]
    corr_planes = np.ascontiguousarray(corr_planes, np.float64)
    corr_mask = np.ascontiguousarray(corr_mask, np.uint8)
    KC = corr_planes.shape[1]
    lp = np.ascontiguousarray(left_planes, np.float64)
    ls = np.ascontiguousarray(left_segs, np.float64)
    lm = np.ascontiguousarray(left_mask, np.uint8)
    rp = np.ascontiguousarray(right_planes, np.float64)
    rs = np.ascontiguousarray(right_segs, np.float64)
    rm = np.ascontiguousarray(right_mask, np.uint8)

    xs = np.zeros((N, 6))
    us = np.zeros((N - 1, 2))
    init_xs = np.zeros((N, 6))
    init_us = np.zeros((N - 1, 2))
    iters = ctypes.c_int(0)
    cost = np.zeros(5)
    p = make_params(cfg, veh, dt)
    status = lib.cilqr_ref_solve(
        _dptr(goals), N, _dptr(corr_planes), _u8ptr(corr_mask), KC,
        _dptr(lp), _dptr(ls), _u8ptr(lm), lp.shape[0],
        _dptr(rp), _dptr(rs), _u8ptr(rm), rp.shape[0],
        ctypes.byref(p), _dptr(xs), _dptr(us), ctypes.byref(iters),
        _dptr(cost), _dptr(init_xs), _dptr(init_us))
    return RefSolveResult(xs=xs, us=us, status=status, iters=iters.value,
                          cost=cost, init_xs=init_xs, init_us=init_us)


def ref_step(x, u, cfg: IlqrConfig, veh: VehicleParam, dt: float):
    lib = load()
    x = np.ascontiguousarray(x, np.float64)
    u = np.ascontiguousarray(u, np.float64)
    xn = np.zeros(6)
    p = make_params(cfg, veh, dt)
    lib.cilqr_ref_step(_dptr(x), _dptr(u), ctypes.byref(p), _dptr(xn))
    return xn


def ref_jacobian(x, u, cfg: IlqrConfig, veh: VehicleParam, dt: float):
    lib = load()
    x = np.ascontiguousarray(x, np.float64)
    u = np.ascontiguousarray(u, np.float64)
    A = np.zeros((6, 6))
    B = np.zeros((6, 2))
    p = make_params(cfg, veh, dt)
    lib.cilqr_ref_jacobian(_dptr(x), _dptr(u), ctypes.byref(p), _dptr(A),
                           _dptr(B))
    return A, B
