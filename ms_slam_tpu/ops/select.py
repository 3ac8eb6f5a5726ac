"""Sliding-window map-point selection: the MS-SLAM sparsification ILP,
TPU-native.

Reference formulation (MapSparsification::Sparsifying,
/root/reference/src/MapSparsification.cc:58-171, GUROBI, MIPGap 0.002):
binary x_p per map point observed in a window of keyframes;

  min  sum_p (maxObs - obs_p) x_p  +  lambda * sum_k th_k
                                   +  lambda_grid * sum_cell th_cell
  s.t. per window KF k:        sum_{p in KF k} x_p + th_k     >= N
       per occupied grid cell: sum_{p in cell} x_p + th_cell  >= 1
       per out-of-window KF o observing window points (pro-rated,
       MapSparsification.cc:125-151):
                               sum_{p in o} x_p + th_o >= ceil(ratio_o * N)

TPU formulation: because every constraint is a sum over *observations* (each
observation belongs to exactly one KF and one grid cell), the LP relaxation
is solved by projected dual ascent where every iteration is two
scatter/gather passes over the observation table — no constraint matrix is
ever materialized:

  score_p = sum_{obs of p} (y_kf(obs) + y_cell(obs));  x_p = [score_p > cost_p]
  y_c    <- clip(y_c + eta (req_c - cover_c), 0, price_c)

(the slack variables bound the duals: th_k costs lambda, so y_k <= lambda).
Selection = LP rounding UNION per-KF top-up to N UNION per-cell argmax —
the repair step makes the output feasible whenever the constraints are
satisfiable, which is the regime the reference operates in (lambda >> point
costs). Quality vs the exact ILP is asserted in tests (scipy HiGHS).

Input layout (static shapes): the window's observation table
  obs_pt   (K, N) int32   dense point slot (0..P-1) or -1
  obs_cell (K, N) int32   grid cell id of the feature (0..G-1)
plus out-of-window observer rows in the same layout with their own
requirement vector.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SelectResult(NamedTuple):
    keep: jnp.ndarray        # (P,) bool selected points
    lp_keep: jnp.ndarray     # (P,) bool LP-rounded selection (pre-repair)
    kf_cover: jnp.ndarray    # (K,) final per-KF kept-observation counts


@partial(jax.jit, static_argnames=("n_cells", "n_iters", "n_prune"))
def select_points(
    obs_pt: jnp.ndarray, obs_cell: jnp.ndarray, obs_valid: jnp.ndarray,
    cost: jnp.ndarray, p_valid: jnp.ndarray,
    req_kf: jnp.ndarray,
    lam: float | jnp.ndarray = 500.0,
    lam_grid: float | jnp.ndarray = 10.0,
    n_cells: int = 64 * 48,
    n_iters: int = 60,
    n_prune: int = 96,
) -> SelectResult:
    """Solve the selection problem.

    Args:
      obs_pt:   (K,N) dense point ids per observation row (-1 invalid). Rows
                may be window KFs or pro-rated out-of-window observers.
      obs_cell: (K,N) cell id per observation.
      obs_valid:(K,N) bool.
      cost:     (P,) point cost (maxObs - obs count), >= 0.
      p_valid:  (P,) bool.
      req_kf:   (K,) per-row coverage requirement (N for window rows,
                ceil(ratio*N) for out-of-window rows, 0 for padding).
    """
    K, N = obs_pt.shape
    P = cost.shape[0]
    obs_ok = obs_valid & (obs_pt >= 0)
    pt = jnp.where(obs_ok, obs_pt, P)            # sentinel -> dropped
    # global cell ids, row-major (kf, cell); out-of-window observer rows pass
    # obs_cell >= n_cells so their cells carry no coverage constraint
    cell_ok = obs_ok & (obs_cell >= 0) & (obs_cell < n_cells)
    gcell = jnp.where(cell_ok,
                      jnp.arange(K)[:, None] * n_cells + obs_cell,
                      K * n_cells)               # sentinel K*n_cells

    occupied = jnp.zeros((K * n_cells + 1,), bool).at[gcell.reshape(-1)].set(
        True).at[-1].set(False)

    lam = jnp.asarray(lam, jnp.float32)
    lam_grid = jnp.asarray(lam_grid, jnp.float32)
    req_kf_f = req_kf.astype(jnp.float32)

    def x_of(score):
        return (score > cost) & p_valid

    def ascent(carry, t):
        y_kf, y_cell = carry
        # score_p = sum over observations of p of (y_kf + y_cell)
        contrib = (y_kf[:, None] * jnp.ones((1, N))
                   + y_cell[gcell]) * obs_ok
        score = jnp.zeros((P + 1,), jnp.float32).at[pt.reshape(-1)].add(
            contrib.reshape(-1))[:P]
        x = x_of(score).astype(jnp.float32)
        # coverage per row and per cell
        xv = x[jnp.clip(obs_pt, 0, P - 1)] * obs_ok
        cover_kf = jnp.sum(xv, axis=1)
        cover_cell = jnp.zeros((K * n_cells + 1,), jnp.float32).at[
            gcell.reshape(-1)].add(xv.reshape(-1))
        # diminishing step keeps the iterates near the dual optimum
        eta = lam / (2.0 + t)
        eta_g = lam_grid / (2.0 + t)
        y_kf = jnp.clip(y_kf + eta * (req_kf_f - cover_kf), 0.0, lam)
        y_cell = jnp.clip(
            y_cell + eta_g * (1.0 - cover_cell) * occupied, 0.0, lam_grid)
        return (y_kf, y_cell), None

    y0 = (jnp.zeros((K,), jnp.float32),
          jnp.zeros((K * n_cells + 1,), jnp.float32))
    (y_kf, y_cell), _ = jax.lax.scan(ascent, y0,
                                     jnp.arange(n_iters, dtype=jnp.float32))

    contrib = (y_kf[:, None] * jnp.ones((1, N)) + y_cell[gcell]) * obs_ok
    score = jnp.zeros((P + 1,), jnp.float32).at[pt.reshape(-1)].add(
        contrib.reshape(-1))[:P]
    lp_keep = x_of(score)

    # --- repair: per-KF top-up to req (rank observed points by LP choice
    # then by low cost), per-cell argmax ---
    sel_obs = lp_keep[jnp.clip(obs_pt, 0, P - 1)] & obs_ok
    # priority per observation: selected first, then cheap points first
    cost_obs = cost[jnp.clip(obs_pt, 0, P - 1)]
    prio = jnp.where(obs_ok,
                     sel_obs * 1e6 - cost_obs,
                     -jnp.inf)
    order = jnp.argsort(-prio, axis=1)           # (K,N) best first
    rank = jnp.zeros((K, N), jnp.int32).at[
        jnp.arange(K)[:, None], order].set(
        jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (K, N)))
    topup = rank < req_kf[:, None]               # keep the first req_k obs
    # per-cell argmax: best observation (same priority) per occupied cell
    best_prio = jnp.full((K * n_cells + 1,), -jnp.inf, prio.dtype).at[
        gcell.reshape(-1)].max(prio.reshape(-1))
    cell_best = (prio == best_prio[gcell]) & cell_ok & (prio > -jnp.inf)

    keep_obs = (sel_obs | topup | cell_best) & obs_ok
    keep = jnp.zeros((P + 1,), bool).at[
        jnp.where(keep_obs, pt, P).reshape(-1)].set(True)[:P] & p_valid

    # --- prune: the union repair overshoots (a point topped-up for one
    # row may be redundant for every constraint once the union settles).
    # Greedy sequential drop of the most expensive SAFE point — safe =
    # removing it leaves every row at/above its requirement and every
    # occupied cell covered — mirrors how the exact ILP only pays for
    # points a constraint actually needs (MIPGap 0.002 reference bar).
    ptc = jnp.clip(obs_pt, 0, P - 1)
    row_ix = jnp.broadcast_to(jnp.arange(K)[:, None], (K, N))

    def prune_body(i, keep):
        kept_obs = keep[ptc] & obs_ok
        slack = jnp.sum(kept_obs, axis=1) - req_kf            # (K,)
        cell_cover = jnp.zeros((K * n_cells + 1,), jnp.int32).at[
            jnp.where(kept_obs, gcell, K * n_cells).reshape(-1)].add(1)
        # per-(row, point) kept-observation counts
        cnt = jnp.zeros((K, P + 1), jnp.int32).at[
            row_ix, jnp.where(kept_obs, pt, P)].add(1)[:, :P]
        row_ok = jnp.all((cnt == 0) | (slack[:, None] >= cnt), axis=0)
        # p holds the sole cover of some occupied constrained cell?
        sole = kept_obs & cell_ok & (cell_cover[gcell] <= 1)
        sole_p = jnp.zeros((P + 1,), bool).at[
            jnp.where(sole, pt, P).reshape(-1)].set(True)[:P]
        safe = keep & row_ok & ~sole_p & (cost > 0)
        j = jnp.argmax(jnp.where(safe, cost, -1.0))
        return keep.at[j].set(keep[j] & ~safe[j])

    keep = jax.lax.fori_loop(0, n_prune, prune_body, keep)

    kept_obs = keep[jnp.clip(obs_pt, 0, P - 1)] & obs_ok
    kf_cover = jnp.sum(kept_obs, axis=1).astype(jnp.int32)
    return SelectResult(keep=keep, lp_keep=lp_keep, kf_cover=kf_cover)


def selection_cost(keep, cost, kf_cover, req_kf, lam, obs_pt=None,
                   obs_cell=None, obs_valid=None, lam_grid=0.0,
                   n_cells=None):
    """Objective value of a selection (for tests): point costs + lambda *
    per-row shortfall (+ lambda_grid * uncovered occupied cells)."""
    c = jnp.sum(jnp.where(keep, cost, 0.0))
    short = jnp.sum(jnp.maximum(req_kf - kf_cover, 0) * lam)
    cell_pen = 0.0
    if obs_pt is not None and lam_grid:
        K, N = obs_pt.shape
        P = cost.shape[0]
        obs_ok = obs_valid & (obs_pt >= 0)
        gcell = jnp.where(obs_ok,
                          jnp.arange(K)[:, None] * n_cells + obs_cell,
                          K * n_cells)
        occupied = jnp.zeros((K * n_cells + 1,), bool).at[
            gcell.reshape(-1)].set(True).at[-1].set(False)
        kept = keep[jnp.clip(obs_pt, 0, P - 1)] & obs_ok
        covered = jnp.zeros((K * n_cells + 1,), bool).at[
            jnp.where(kept, gcell, K * n_cells).reshape(-1)].set(True)
        cell_pen = lam_grid * jnp.sum(occupied & ~covered)
    return c + short + cell_pen
