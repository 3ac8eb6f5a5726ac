"""Robust loss weights for iteratively-reweighted Gauss-Newton.

Replaces g2o's RobustKernelHuber/Cauchy usage throughout the reference's
Optimizer (/root/reference/src/Optimizer.cc, e.g. PoseOptimization:759 uses
Huber with delta = sqrt(5.991) mono / sqrt(7.815) stereo).

Weights multiply squared residual blocks: the IRLS weight w(e) such that
w * J^T J approximates the robustified normal equations.
"""
from __future__ import annotations

import jax.numpy as jnp

# chi2 95% quantiles used as Huber deltas^2 / outlier gates in the reference
CHI2_2DOF = 5.991
CHI2_3DOF = 7.815


def huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """IRLS weight for Huber loss given squared error chi2 and delta^2."""
    chi2 = jnp.maximum(chi2, 1e-12)
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / chi2))


def cauchy_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    return 1.0 / (1.0 + chi2 / delta2)


def tukey_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    r = chi2 / delta2
    w = jnp.where(r <= 1.0, (1.0 - r) ** 2, 0.0)
    return w
