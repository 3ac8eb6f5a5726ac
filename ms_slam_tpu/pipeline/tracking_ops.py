"""Jitted tracking-step kernels.

The compute half of Tracking::Track (/root/reference/src/Tracking.cc:1783):
motion-model / local-map association + motion-only pose optimization fused
into single device calls. The host-side Tracker (tracking.py) owns the state
machine and keyframe policy; everything here is pure.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import map_state as M
from ..ops import matching, pose_opt
from .frontend import Calib, FrameData
from ..ops.orb import OrbConfig


class TrackOut(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    matched_mp: jnp.ndarray   # (N,) per-feature map point idx (-1 none),
                              # inliers only
    n_matched: jnp.ndarray    # matches fed to the optimizer
    n_inliers: jnp.ndarray


@partial(jax.jit, static_argnames=("calib", "orb_cfg"))
def track_points(ms: M.MapState, calib: Calib, orb_cfg: OrbConfig,
                 frame: FrameData, R0: jnp.ndarray, t0: jnp.ndarray,
                 pt_idx: jnp.ndarray, pt_valid: jnp.ndarray,
                 th_radius: jnp.ndarray, nn_ratio: jnp.ndarray) -> TrackOut:
    """Project the given candidate map points into the frame, associate, and
    optimize the pose (ref SearchByProjection + PoseOptimization).

    pt_idx/pt_valid: fixed-capacity candidate buffer (local map or last
    frame's points).
    """
    params = calib.params_array()
    f = frame.feats
    pm = matching.search_by_projection(
        calib.model, params, R0, t0, calib.width, calib.height,
        ms.mp_pos[pt_idx], ms.mp_normal[pt_idx],
        ms.mp_min_dist[pt_idx], ms.mp_max_dist[pt_idx],
        ms.mp_desc[pt_idx], pt_valid & ms.mp_valid[pt_idx],
        f.xy, f.octave, f.desc, f.valid,
        th_radius=th_radius, nn_ratio=nn_ratio,
        scale_factor=orb_cfg.scale_factor, n_levels=orb_cfg.n_levels)

    mp_of_feat = jnp.where(pm.mp_slot >= 0,
                           pt_idx[jnp.clip(pm.mp_slot, 0)], -1).astype(jnp.int32)
    has = mp_of_feat >= 0
    X = ms.mp_pos[jnp.clip(mp_of_feat, 0)]
    res = pose_opt.pose_optimize(
        calib.model, params, jnp.asarray(calib.bf), R0, t0,
        X, f.xy, frame.u_right, frame.sigma2, has)
    matched = jnp.where(res.inlier, mp_of_feat, -1)
    return TrackOut(R=res.R, t=res.t, matched_mp=matched,
                    n_matched=pm.n_matches,
                    n_inliers=res.n_inliers)


@partial(jax.jit, static_argnames=("calib",))
def track_by_appearance(ms: M.MapState, calib: Calib, frame: FrameData,
                        kf: jnp.ndarray, R0: jnp.ndarray,
                        t0: jnp.ndarray) -> TrackOut:
    """Appearance-only association against one keyframe's landmarks + pose
    optimization (ref Tracking::TrackReferenceKeyFrame, src/Tracking.cc:2703
    — SearchByBoW has no spatial gate, which is what makes it robust to
    large motion; also the per-candidate step of Relocalization :3641)."""
    params = calib.params_array()
    f = frame.feats
    kf_has = ms.kp_valid[kf] & (ms.obs_mp[kf] >= 0)
    mm = matching.mutual_match(f.desc, f.valid, ms.kp_desc[kf], kf_has,
                               max_dist=matching.TH_LOW, nn_ratio=0.7)
    has = mm.idx_b >= 0
    mp = jnp.where(has, ms.obs_mp[kf][jnp.clip(mm.idx_b, 0)], -1)
    has &= mp >= 0
    X = ms.mp_pos[jnp.clip(mp, 0)]
    res = pose_opt.pose_optimize(
        calib.model, params, jnp.asarray(calib.bf), R0, t0,
        X, f.xy, frame.u_right, frame.sigma2, has)
    matched = jnp.where(res.inlier, mp, -1).astype(jnp.int32)
    return TrackOut(R=res.R, t=res.t, matched_mp=matched,
                    n_matched=mm.n_matches, n_inliers=res.n_inliers)


class TrackFullOut(NamedTuple):
    ms: M.MapState
    R: jnp.ndarray
    t: jnp.ndarray
    matched_mp: jnp.ndarray
    stats: jnp.ndarray
    """(32,) float32: [R row-major (9), t (3), motion_inliers, used_wide,
    used_fallback, local_inliers, n_close_tracked, n_close_untracked,
    best_local_kf, n_local_candidates, ref-KF R row-major (9), ref-KF t (3)]
    — the ref pose rides along so a reference-keyframe switch costs no
    extra device->host round trip (ref Tracking::mpReferenceKF update)."""


@partial(jax.jit, static_argnames=("calib", "orb_cfg", "local_cap"),
         donate_argnames=("ms",))
def track_full(ms: M.MapState, calib: Calib, orb_cfg: OrbConfig,
               frame: FrameData, R0: jnp.ndarray, t0: jnp.ndarray,
               R_last: jnp.ndarray, t_last: jnp.ndarray,
               last_matched: jnp.ndarray, ref_kf: jnp.ndarray,
               local_cap: int) -> TrackFullOut:
    """The entire per-frame tracking compute as one fused device call:
    motion-model association (+ widened retry + appearance fallback, both as
    lax.cond so the hot path costs nothing extra), local-map tracking,
    point-statistics update, and keyframe-decision counters. One dispatch,
    one (8,) readback per frame — the deterministic-schedule replacement
    for Tracking::Track's in-thread sequence (src/Tracking.cc:1783)."""
    pt_idx = jnp.clip(last_matched, 0)
    pt_valid = last_matched >= 0

    out1 = track_points(ms, calib, orb_cfg, frame, R0, t0, pt_idx, pt_valid,
                        jnp.asarray(7.0), jnp.asarray(0.9))
    need_wide = out1.n_inliers < 20
    out2 = jax.lax.cond(
        need_wide,
        lambda: track_points(ms, calib, orb_cfg, frame, R0, t0, pt_idx,
                             pt_valid, jnp.asarray(14.0), jnp.asarray(0.9)),
        lambda: out1)
    need_fb = out2.n_inliers < 10
    out3 = jax.lax.cond(
        need_fb,
        lambda: track_by_appearance(ms, calib, frame, ref_kf, R_last, t_last),
        lambda: out2)

    lk_idx, lk_mask = local_keyframes(ms, out3.matched_mp, k=10)
    lmask = M.local_map_mask(ms, lk_idx, lk_mask)
    l_idx, l_valid = M.gather_local_points(ms, lmask, local_cap)
    out4 = track_points(ms, calib, orb_cfg, frame, out3.R, out3.t,
                        l_idx, l_valid, jnp.asarray(1.0), jnp.asarray(0.8))
    ms = update_point_stats(ms, l_idx, l_valid, out4.matched_mp)
    n_ct, n_cu = count_trackable_close(calib, frame, out4.matched_mp)
    stats_i = jnp.stack([
        out3.n_inliers, need_wide.astype(jnp.int32), need_fb.astype(jnp.int32),
        out4.n_inliers, n_ct, n_cu, lk_idx[0],
        jnp.sum(l_valid).astype(jnp.int32)]).astype(jnp.int32)
    # pose + stats packed into one (20,) array => a single host fetch per
    # frame (each device->host transfer is a full round trip on a tunneled
    # TPU)
    best_kf = lk_idx[0]
    packed = jnp.concatenate([
        out4.R.reshape(9).astype(jnp.float32),
        out4.t.astype(jnp.float32),
        stats_i.astype(jnp.float32),
        ms.kf_R[best_kf].reshape(9).astype(jnp.float32),
        ms.kf_t[best_kf].astype(jnp.float32)])
    return TrackFullOut(ms=ms, R=out4.R, t=out4.t,
                        matched_mp=out4.matched_mp, stats=packed)


@partial(jax.jit, static_argnames=("k",))
def local_keyframes(ms: M.MapState, matched_mp: jnp.ndarray, k: int):
    """Local keyframe set for local-map tracking: keyframes sharing the most
    observations with the current frame's matches, by vote (ref
    Tracking::UpdateLocalKeyFrames, src/Tracking.cc:3431).

    Returns (idx (k,), mask (k,))."""
    Mc = ms.mp_pos.shape[0]
    tbl = M.member_table(matched_mp, Mc)
    obs = ms.obs_mp
    hit = tbl[jnp.clip(obs, 0, Mc)] & (obs >= 0) & ms.kf_valid[:, None]
    votes = jnp.sum(hit, axis=1)
    w, idx = jax.lax.top_k(votes, k)
    return idx, w > 0


@jax.jit
def update_point_stats(ms: M.MapState, pt_idx: jnp.ndarray,
                       visible: jnp.ndarray, matched_mp: jnp.ndarray):
    """IncreaseVisible for frustum-passing candidates, IncreaseFound for
    tracked inliers (ref Tracking::SearchLocalPoints/TrackLocalMap)."""
    ms = M.update_mp_stats(ms, pt_idx, visible, jnp.zeros_like(visible))
    found_idx = jnp.where(matched_mp >= 0, matched_mp, ms.mp_pos.shape[0])
    ms = ms._replace(mp_found=ms.mp_found.at[found_idx].add(1, mode="drop"))
    return ms


@partial(jax.jit, static_argnames=("calib",))
def count_trackable_close(calib: Calib, frame: FrameData,
                          matched_mp: jnp.ndarray):
    """Keyframe-decision counters (ref Tracking::NeedNewKeyFrame
    close-point condition, src/Tracking.cc:3100-3125): tracked close points
    and untracked-but-triangulable close points."""
    close = (frame.depth > 0) & (frame.depth <= calib.th_depth) \
        & frame.feats.valid
    tracked = close & (matched_mp >= 0)
    untracked = close & (matched_mp < 0)
    return jnp.sum(tracked).astype(jnp.int32), \
        jnp.sum(untracked).astype(jnp.int32)
