"""Batched two-view triangulation.

Replaces GeometricTools::Triangulate (/root/reference/src/GeometricTools.cc,
include/GeometricTools.h:40): DLT from two 3x4 projection matrices, solved
per-point by SVD of the 4x4 design matrix — here batched over N points so the
whole keyframe's candidate set triangulates in one fused kernel.
"""
from __future__ import annotations

import jax.numpy as jnp


def triangulate_dlt(xn1: jnp.ndarray, xn2: jnp.ndarray,
                    P1: jnp.ndarray, P2: jnp.ndarray) -> jnp.ndarray:
    """DLT triangulation.

    Args:
      xn1, xn2: (...,3) normalized bearings in each camera (z may be 1).
      P1, P2:   (...,3,4) world->camera projection matrices (normalized, i.e.
                [R|t], intrinsics already removed).
    Returns:
      (...,3) world points (homogeneous solution dehomogenized).
    """
    # Rows x*P[2]-z*P[0], y*P[2]-z*P[1] per view; split [A | b] with
    # X homogeneous weight fixed to 1 (no points at infinity in stereo /
    # local-map triangulation) -> 4x3 least squares via 3x3 normal equations.
    def two_rows(x, P):
        r0 = x[..., 0:1] * P[..., 2, :] - x[..., 2:3] * P[..., 0, :]
        r1 = x[..., 1:2] * P[..., 2, :] - x[..., 2:3] * P[..., 1, :]
        return r0, r1

    a0, a1 = two_rows(xn1, P1)
    a2, a3 = two_rows(xn2, P2)
    A4 = jnp.stack([a0, a1, a2, a3], axis=-2)  # (...,4,4)
    A = A4[..., :3]
    b = -A4[..., 3]
    AtA = jnp.swapaxes(A, -1, -2) @ A
    Atb = jnp.einsum("...ij,...i->...j", A, b)
    AtA = AtA + 1e-12 * jnp.eye(3, dtype=A.dtype)
    from .lie import solve3x3
    return solve3x3(AtA, Atb)


def triangulate_midpoint(o1, d1, o2, d2):
    """Midpoint triangulation for rays (origin, direction): robust fallback
    used for fisheye stereo (ref KannalaBrandt8::Triangulate analog)."""
    # Solve [d1 -d2][s;t] = o2-o1 in least squares.
    b = o2 - o1
    d11 = jnp.sum(d1 * d1, axis=-1)
    d12 = jnp.sum(d1 * d2, axis=-1)
    d22 = jnp.sum(d2 * d2, axis=-1)
    bd1 = jnp.sum(b * d1, axis=-1)
    bd2 = jnp.sum(b * d2, axis=-1)
    den = d11 * d22 - d12 * d12
    den = jnp.where(jnp.abs(den) > 1e-12, den, 1e-12)
    s = (bd1 * d22 - bd2 * d12) / den
    t = (bd1 * d12 - bd2 * d11) / den
    p1 = o1 + s[..., None] * d1
    p2 = o2 + t[..., None] * d2
    return 0.5 * (p1 + p2)
