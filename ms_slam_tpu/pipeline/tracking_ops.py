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


@partial(jax.jit, static_argnames=("k",))
def local_keyframes(ms: M.MapState, matched_mp: jnp.ndarray, k: int):
    """Local keyframe set for local-map tracking: keyframes sharing the most
    observations with the current frame's matches, by vote (ref
    Tracking::UpdateLocalKeyFrames, src/Tracking.cc:3431).

    Returns (idx (k,), mask (k,))."""
    ids = jnp.where(matched_mp >= 0, matched_mp, jnp.iinfo(jnp.int32).max)
    ids = jnp.sort(ids)
    obs = ms.obs_mp
    pos = jnp.clip(jnp.searchsorted(ids, obs), 0, ids.shape[0] - 1)
    hit = (ids[pos] == obs) & (obs >= 0) & ms.kf_valid[:, None]
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
