"""Batched Horn alignment + RANSAC for loop-closure geometric verification.

Replaces Sim3Solver (/root/reference/src/Sim3Solver.cc: RANSAC over 3-point
samples, Horn closed form via ComputeSim3, reprojection-gated inliers in
both cameras). TPU formulation: all RANSAC hypotheses are computed at once
(vmapped 3-point Horn), inliers counted by masked reprojection for every
hypothesis simultaneously, best hypothesis refined once on its inliers.
Scale is optional: fixed to 1 for stereo/RGB-D (bFixScale=true in the
reference) and free for monocular.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import cameras


def horn(X: jnp.ndarray, Y: jnp.ndarray, w: jnp.ndarray,
         with_scale: bool = False):
    """Weighted closed-form alignment Y ~ s R X + t.

    X, Y: (...,N,3); w: (...,N) weights. Returns (s, R, t)."""
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    wn = w / wsum
    mx = jnp.sum(X * wn[..., None], axis=-2, keepdims=True)
    my = jnp.sum(Y * wn[..., None], axis=-2, keepdims=True)
    Xc = (X - mx) * jnp.sqrt(wn)[..., None]
    Yc = (Y - my) * jnp.sqrt(wn)[..., None]
    H = jnp.einsum("...ni,...nj->...ij", Yc, Xc)
    U, S, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None],
         det[..., None]], axis=-1)
    R = U @ (D[..., :, None] * Vt)
    if with_scale:
        num = jnp.sum(S * D, axis=-1)
        den = jnp.maximum(jnp.sum(Xc * Xc, axis=(-1, -2)), 1e-12)
        s = num / den
    else:
        s = jnp.ones(R.shape[:-2], R.dtype)
    t = my[..., 0, :] - s[..., None] * jnp.einsum("...ij,...j->...i",
                                                  R, mx[..., 0, :])
    return s, R, t


class Sim3RansacResult(NamedTuple):
    s: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray     # (N,) bool
    n_inliers: jnp.ndarray


@partial(jax.jit, static_argnames=("model", "n_hyp", "with_scale"))
def sim3_ransac(model: int, params: jnp.ndarray,
                Xc1: jnp.ndarray, Xc2: jnp.ndarray,
                sigma2_1: jnp.ndarray, sigma2_2: jnp.ndarray,
                valid: jnp.ndarray, key: jnp.ndarray,
                n_hyp: int = 128, with_scale: bool = False,
                chi2_th: float = 9.21) -> Sim3RansacResult:
    """Estimate S12 mapping camera-2-frame points into camera-1's frame.

    Xc1/Xc2: (N,3) the same landmarks in each keyframe's camera frame
    (ref Sim3Solver ctor gathers camera-frame coords). Inliers are gated by
    reprojection in both cameras (ref CheckInliers, chi2 9.21 ~ 2dof 99%).
    """
    N = Xc1.shape[0]
    # random 3-point samples biased to valid entries
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    idx = jax.random.choice(key, N, shape=(n_hyp, 3), replace=True, p=p)
    Xs = Xc2[idx]                     # (H,3,3) from cam2
    Ys = Xc1[idx]                     # (H,3,3) to cam1
    w = jnp.ones((n_hyp, 3), Xc1.dtype)
    s, R, t = horn(Xs, Ys, w, with_scale)   # maps cam2 -> cam1

    # count reprojection inliers per hypothesis
    uv1 = cameras.project(model, params, Xc1)          # observed proxies
    uv2 = cameras.project(model, params, Xc2)

    def count(args):
        s_h, R_h, t_h = args
        X2in1 = s_h * (Xc2 @ R_h.T) + t_h
        e1 = jnp.sum((cameras.project(model, params, X2in1) - uv1) ** 2, -1) \
            / sigma2_1
        si = 1.0 / s_h
        X1in2 = si * ((Xc1 - t_h) @ R_h)
        e2 = jnp.sum((cameras.project(model, params, X1in2) - uv2) ** 2, -1) \
            / sigma2_2
        ok = valid & (e1 < chi2_th) & (e2 < chi2_th) \
            & (X2in1[:, 2] > 0) & (X1in2[:, 2] > 0)
        return ok

    ok_all = jax.vmap(lambda s_h, R_h, t_h: count((s_h, R_h, t_h)))(s, R, t)
    scores = jnp.sum(ok_all, axis=1)
    best = jnp.argmax(scores)
    inl = ok_all[best]
    # refine on the best hypothesis' inliers
    s_f, R_f, t_f = horn(Xc2, Xc1, inl.astype(Xc1.dtype), with_scale)
    inl_f = count((s_f, R_f, t_f))
    better = jnp.sum(inl_f) >= scores[best]
    s_o = jnp.where(better, s_f, s[best])
    R_o = jnp.where(better, R_f, R[best])
    t_o = jnp.where(better, t_f, t[best])
    inl_o = jnp.where(better, inl_f, inl)
    return Sim3RansacResult(s=s_o, R=R_o, t=t_o, inliers=inl_o,
                            n_inliers=jnp.sum(inl_o).astype(jnp.int32))
