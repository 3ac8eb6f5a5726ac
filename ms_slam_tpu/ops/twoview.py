"""Monocular two-view reconstruction (map initialization).

Replaces TwoViewReconstruction (/root/reference/src/TwoViewReconstruction.cc:
parallel homography/fundamental RANSAC + model selection + motion hypothesis
decomposition + cheirality-checked triangulation, called from
Pinhole::ReconstructWithTwoViews).

TPU formulation: all RANSAC hypotheses at once — vmapped 8-point essential
estimation on unprojected bearings (camera-model agnostic), symmetric
epipolar scoring of every hypothesis against every match in one pass, then
the 4-way (R,t) decomposition of the best E resolved by batched cheirality
counting. The reference's separate homography path guards planar scenes;
here the parallax/cheirality gates reject degenerate geometry and
initialization simply retries on a later frame (same external behavior:
initialization succeeds only on good geometry).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import cameras, lie, triangulate


class TwoViewResult(NamedTuple):
    ok: jnp.ndarray        # () bool
    R: jnp.ndarray         # (3,3) cam2-from-cam1
    t: jnp.ndarray         # (3,) unit norm
    X1: jnp.ndarray        # (N,3) points in cam1 frame
    inlier: jnp.ndarray    # (N,) bool (triangulated + cheirality-clean)
    n_good: jnp.ndarray


def _essential_8pt(x1, x2):
    """x1,x2: (8,3) bearings (z=1). Returns E (3,3)."""
    a = jnp.stack([
        x2[:, 0] * x1[:, 0], x2[:, 0] * x1[:, 1], x2[:, 0] * x1[:, 2],
        x2[:, 1] * x1[:, 0], x2[:, 1] * x1[:, 1], x2[:, 1] * x1[:, 2],
        x2[:, 2] * x1[:, 0], x2[:, 2] * x1[:, 1], x2[:, 2] * x1[:, 2],
    ], axis=-1)                                   # (8,9), rows a_i . e = 0
    _, _, Vt = jnp.linalg.svd(a, full_matrices=True)
    E = Vt[-1].reshape(3, 3)
    # project onto the essential manifold: singular values (1,1,0)
    U, S, Vt2 = jnp.linalg.svd(E)
    E = U @ jnp.diag(jnp.asarray([1.0, 1.0, 0.0], E.dtype)) @ Vt2
    return E


def _epi_errs(E, x1, x2, f2):
    """Squared symmetric epipolar transfer distance (approx px^2)."""
    l2 = x1 @ E.T                                  # epipolar lines in cam 2
    l1 = x2 @ E
    num = jnp.einsum("nj,nj->n", x2, l2) ** 2
    d2 = num / (l2[:, 0] ** 2 + l2[:, 1] ** 2 + 1e-12)
    d1 = num / (l1[:, 0] ** 2 + l1[:, 1] ** 2 + 1e-12)
    return (d1 + d2) * f2 * f2


@partial(jax.jit, static_argnames=("model", "n_hyp"))
def reconstruct(model: int, params: jnp.ndarray,
                xy1: jnp.ndarray, xy2: jnp.ndarray, valid: jnp.ndarray,
                key: jnp.ndarray, n_hyp: int = 256,
                th_px2: float = 4.0, min_parallax_cos: float = 0.99995):
    """Estimate relative pose + structure from matched features.

    xy1/xy2: (N,2) matched pixel coords (pairs aligned); valid: (N,).
    """
    N = xy1.shape[0]
    x1 = cameras.unproject(model, params, xy1)
    x2 = cameras.unproject(model, params, xy2)
    f = params[0]

    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    idx = jax.random.choice(key, N, shape=(n_hyp, 8), replace=True, p=p)
    Es = jax.vmap(lambda i: _essential_8pt(x1[i], x2[i]))(idx)
    errs = jax.vmap(lambda E: _epi_errs(E, x1, x2, f))(Es)   # (H,N)
    inl = (errs < th_px2) & valid[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    E = Es[best]
    e_inl = inl[best]

    # decompose: 4 hypotheses (R1,t),(R1,-t),(R2,t),(R2,-t)
    U, _, Vt = jnp.linalg.svd(E)
    d = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    U = U * jnp.where(d < 0, -1.0, 1.0)
    Wm = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                     E.dtype)
    R1 = U @ Wm @ Vt
    R2 = U @ Wm.T @ Vt
    tu = U[:, 2]
    tu = tu / (jnp.linalg.norm(tu) + 1e-12)

    def check(R, t):
        P1 = jnp.broadcast_to(
            jnp.concatenate([jnp.eye(3, dtype=E.dtype),
                             jnp.zeros((3, 1), E.dtype)], 1), (N, 3, 4))
        P2 = jnp.broadcast_to(
            jnp.concatenate([R, t[:, None]], 1), (N, 3, 4))
        X = triangulate.triangulate_dlt(x1, x2, P1, P2)
        z1 = X[:, 2]
        Xc2 = lie.se3_apply(R, t, X)
        z2 = Xc2[:, 2]
        # parallax: rays from both camera centers
        o2 = -R.T @ t
        v1 = X
        v2 = X - o2
        cosp = jnp.sum(v1 * v2, -1) / (
            jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1)
            + 1e-12)
        good = e_inl & (z1 > 0) & (z2 > 0)
        parallax_ok = good & (cosp < min_parallax_cos)
        return jnp.sum(good), jnp.sum(parallax_ok), X, good & (
            cosp < 0.99999)

    cands = [(R1, tu), (R1, -tu), (R2, tu), (R2, -tu)]
    counts = []
    results = []
    for R, t in cands:
        ng, npar, X, g = check(R, t)
        counts.append(ng)
        results.append((R, t, X, g, npar))
    counts = jnp.stack(counts)
    bi = jnp.argmax(counts)
    R_o = jnp.stack([r[0] for r in results])[bi]
    t_o = jnp.stack([r[1] for r in results])[bi]
    X_o = jnp.stack([r[2] for r in results])[bi]
    g_o = jnp.stack([r[3] for r in results])[bi]
    npar_o = jnp.stack([r[4] for r in results])[bi]

    n_best = counts[bi]
    # winner must dominate (ref ReconstructF: best clearly beats second)
    second = jnp.sort(counts)[-2]
    n_valid = jnp.sum(valid)
    ok = (n_best >= 50) & (n_best > 0.75 * n_valid) \
        & (second < 0.8 * n_best) & (npar_o > 30)
    return TwoViewResult(ok=ok, R=R_o, t=t_o, X1=X_o, inlier=g_o,
                         n_good=n_best)
