"""Distributed bundle adjustment over a TPU device mesh.

No reference counterpart exists — MS-SLAM is single-process
(/root/reference SURVEY §2.7) — this is the scale-out path (SURVEY §7
Phase 5): observation factors are sharded across devices ("data parallel"
over the factor table); every device computes its partial Gauss-Newton
blocks (camera 6x6, point 3x3, coupling W) locally, the blocks are reduced
with jax.lax.psum over ICI, and the (replicated) Schur camera solve +
point back-substitution happen identically on all devices. One jit, no
host involvement per iteration.

The factor dimension is the natural shard axis because SLAM Hessians are
sums over independent observations; the reduced camera system is tiny
compared to the factor table, so psum traffic is O(C^2 + P) per iteration
while factor work scales 1/devices.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import lie, robust
from ..ops.ba import _factor_res_jac


def make_mesh(n_devices: int | None = None, axis: str = "factors") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np
    return Mesh(np.asarray(devs), (axis,))


def shard_factors(mesh: Mesh, *arrays, axis: str = "factors"):
    """Place factor-table arrays with their leading dim split over the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return tuple(jax.device_put(a, sh) for a in arrays)


def replicate(mesh: Mesh, *arrays):
    sh = NamedSharding(mesh, P())
    return tuple(jax.device_put(a, sh) for a in arrays)


def dist_ba_solve(mesh: Mesh, model: int, params, bf,
                  kf_R, kf_t, cam_opt, mp_pos, pt_opt,
                  f_cam, f_pt, f_uv, f_ur, f_sigma2, f_valid,
                  n_iters: int = 10, lam: float = 1e-4,
                  axis: str = "factors"):
    """Sharded ba_solve: same semantics as ops.ba.ba_solve, factors split
    over `axis`. Returns (kf_R, kf_t, mp_pos)."""
    C = kf_R.shape[0]
    Pn = mp_pos.shape[0]
    dt = kf_R.dtype
    params = jnp.asarray(params, dt)
    bf = jnp.asarray(bf, dt)

    fspec = P(axis)
    rspec = P()

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(rspec, rspec, rspec, rspec, rspec,
                       fspec, fspec, fspec, fspec, fspec, fspec),
             out_specs=rspec)
    def run(kf_R, kf_t, cam_opt, mp_pos, pt_opt,
            f_cam, f_pt, f_uv, f_ur, f_sigma2, f_valid):
        is_stereo = f_ur >= 0.0
        w_info = jnp.where(f_valid, 1.0 / jnp.maximum(f_sigma2, 1e-12), 0.0)
        hub_d2 = jnp.where(is_stereo, robust.CHI2_3DOF, robust.CHI2_2DOF)

        def iteration(state, _):
            R_all, t_all, P_all = state
            res, Jc, Jp, z = _factor_res_jac(
                model, params, bf, R_all, t_all, P_all,
                f_cam, f_pt, f_uv, f_ur, is_stereo)
            chi2 = jnp.sum(res * res, axis=-1) * w_info
            active = z > 1e-2
            w = robust.huber_weight(chi2, hub_d2) * w_info * active
            Jc = jnp.where(cam_opt[f_cam][:, None, None], Jc, 0.0)
            Jp = jnp.where(pt_opt[f_pt][:, None, None], Jp, 0.0)
            JcW = Jc * w[:, None, None]
            JpW = Jp * w[:, None, None]

            # local partial blocks, reduced over the factor axis via psum
            Hcc = jax.lax.psum(
                jnp.zeros((C, 6, 6), dt).at[f_cam].add(
                    jnp.einsum("fij,fik->fjk", JcW, Jc)), axis)
            bc = jax.lax.psum(
                jnp.zeros((C, 6), dt).at[f_cam].add(
                    -jnp.einsum("fij,fi->fj", JcW, res)), axis)
            Hpp = jax.lax.psum(
                jnp.zeros((Pn, 3, 3), dt).at[f_pt].add(
                    jnp.einsum("fij,fik->fjk", JpW, Jp)), axis)
            bp = jax.lax.psum(
                jnp.zeros((Pn, 3), dt).at[f_pt].add(
                    -jnp.einsum("fij,fi->fj", JpW, res)), axis)
            Wcp = jnp.einsum("fij,fik->fjk", JcW, Jp)
            W = jax.lax.psum(
                jnp.zeros((Pn, C, 6, 3), dt).at[f_pt, f_cam].add(Wcp), axis)
            W = W.reshape(Pn, C * 6, 3)

            eyeC = jnp.eye(6, dtype=dt)
            Hcc = Hcc + lam * jax.vmap(
                lambda h: jnp.diag(jnp.diag(h)))(Hcc) + 1e-8 * eyeC
            eyeP = jnp.eye(3, dtype=dt)
            Hpp = Hpp + lam * jax.vmap(
                lambda h: jnp.diag(jnp.diag(h)))(Hpp) + 1e-8 * eyeP
            Hpp_inv = lie.inv3x3(Hpp)

            Hcc_big = jnp.zeros((C * 6, C * 6), dt).at[
                (jnp.arange(C)[:, None, None] * 6
                 + jnp.arange(6)[None, :, None]),
                (jnp.arange(C)[:, None, None] * 6
                 + jnp.arange(6)[None, None, :]),
            ].set(Hcc)
            S = Hcc_big - jnp.einsum("pax,pxy,pby->ab", W, Hpp_inv, W)
            v = bc.reshape(C * 6) - jnp.einsum("pax,pxy,py->a", W, Hpp_inv, bp)
            dxc = jnp.linalg.solve(S + 1e-8 * jnp.eye(C * 6, dtype=dt), v)
            dxp = jnp.einsum("pxy,py->px", Hpp_inv,
                             bp - jnp.einsum("pax,a->px", W, dxc))
            dxc = dxc.reshape(C, 6) * cam_opt[:, None]
            dxp = dxp * pt_opt[:, None]
            dR, dtc = lie.se3_exp(dxc)
            R_new, t_new = lie.se3_compose(dR, dtc, R_all, t_all)
            R_new = lie.normalize_rotation(R_new)
            return (R_new, t_new, P_all + dxp), None

        state, _ = jax.lax.scan(iteration, (kf_R, kf_t, mp_pos), None,
                                length=n_iters)
        return state

    return run(kf_R, kf_t, cam_opt, mp_pos, pt_opt,
               f_cam, f_pt, f_uv, f_ur, f_sigma2, f_valid)


def dist_global_ba(ms, calib, orb_cfg, fixed_kf: int, mesh: Mesh,
                   n_iters: int = 10, axis: str = "factors"):
    """Whole-map global BA through the device mesh — the pipeline entry
    point (ref Optimizer::GlobalBundleAdjustemnt via
    RunGlobalBundleAdjustment, src/LoopClosing.cc:2212, here sharded over
    ICI instead of a transient host thread). Builds the same full factor
    table as pipeline.mapping_ops.global_ba and runs the sharded Schur
    solver; returns the updated MapState."""
    from ..pipeline.mapping_ops import _scale2

    K, N = ms.obs_mp.shape
    n_dev = mesh.devices.size
    obs = ms.obs_mp
    f_valid = (obs >= 0) & ms.kf_valid[:, None] & ms.kp_valid
    f_cam = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[:, None], (K, N)).reshape(-1)
    f_pt = jnp.clip(obs, 0).reshape(-1)
    f_uv = ms.kp_xy.reshape(K * N, 2)
    f_ur = ms.kp_uright.reshape(-1)
    s2 = _scale2(orb_cfg)
    f_s2 = s2[ms.kp_octave].reshape(-1)
    f_valid = f_valid.reshape(-1)
    pad = (-(K * N)) % n_dev
    if pad:
        f_cam = jnp.pad(f_cam, (0, pad))
        f_pt = jnp.pad(f_pt, (0, pad))
        f_uv = jnp.pad(f_uv, ((0, pad), (0, 0)))
        f_ur = jnp.pad(f_ur, (0, pad), constant_values=-1.0)
        f_s2 = jnp.pad(f_s2, (0, pad), constant_values=1.0)
        f_valid = jnp.pad(f_valid, (0, pad))
    cam_opt = ms.kf_valid & (jnp.arange(K) != fixed_kf)

    R_n, t_n, P_n = dist_ba_solve(
        mesh, calib.model, calib.params_array(), jnp.asarray(calib.bf),
        ms.kf_R, ms.kf_t, cam_opt, ms.mp_pos, ms.mp_valid,
        f_cam, f_pt, f_uv, f_ur, f_s2, f_valid, n_iters=n_iters)
    return ms._replace(kf_R=R_n, kf_t=t_n, mp_pos=P_n)
