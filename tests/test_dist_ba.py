"""Distributed BA on the 8-device virtual CPU mesh must match the
single-device solver."""
import jax
import jax.numpy as jnp
import numpy as np

from ms_slam_tpu.ops import ba, cameras
from ms_slam_tpu.parallel import dist_ba

from test_ba import make_bundle, PIN, BF


def test_dist_matches_single(rng):
    assert len(jax.devices()) >= 8
    Rs, ts, P, f_cam, f_pt, f_uv, f_ur, F = make_bundle(rng, n_cams=5,
                                                        n_pts=120)
    # pad factor table to a multiple of 8 for even sharding
    pad = (-F) % 8
    f_cam = np.pad(f_cam, (0, pad))
    f_pt = np.pad(f_pt, (0, pad))
    f_uv = np.pad(f_uv, ((0, pad), (0, 0)))
    f_ur = np.pad(f_ur, (0, pad), constant_values=-1.0)
    f_valid = np.zeros(F + pad, bool)
    f_valid[:F] = True
    sigma2 = np.ones(F + pad)

    n_cams, n_pts = Rs.shape[0], P.shape[0]
    cam_opt = np.ones(n_cams, bool)
    cam_opt[:2] = False
    Rp = Rs.copy()
    tp = ts + np.concatenate(
        [np.zeros((2, 3)), rng.normal(0, 0.05, (n_cams - 2, 3))])
    Pp = P + rng.normal(0, 0.02, P.shape)

    args = (jnp.asarray(Rp), jnp.asarray(tp), jnp.asarray(cam_opt),
            jnp.asarray(Pp), jnp.ones(n_pts, bool))
    fargs = (jnp.asarray(f_cam), jnp.asarray(f_pt), jnp.asarray(f_uv),
             jnp.asarray(f_ur), jnp.asarray(sigma2), jnp.asarray(f_valid))

    mesh = dist_ba.make_mesh(8)
    R_d, t_d, P_d = dist_ba.dist_ba_solve(
        mesh, cameras.PINHOLE, PIN, BF, *args, *fargs, n_iters=6)

    # reference: single-device ba_solve has a two-stage schedule, so compare
    # against a straight run of the same math by using dist solve on a
    # 1-device mesh
    mesh1 = dist_ba.make_mesh(1)
    R_1, t_1, P_1 = dist_ba.dist_ba_solve(
        mesh1, cameras.PINHOLE, PIN, BF, *args, *fargs, n_iters=6)

    np.testing.assert_allclose(R_d, R_1, atol=1e-8)
    np.testing.assert_allclose(t_d, t_1, atol=1e-8)
    np.testing.assert_allclose(P_d, P_1, atol=1e-8)

    # and it actually solves the problem
    for c in range(2, n_cams):
        dt_err = np.linalg.norm(np.asarray(t_d[c]) - ts[c])
        assert dt_err < 0.02, (c, dt_err)


def test_pipeline_dist_global_ba_matches_single():
    """The pipeline's sharded post-loop global BA (dist_global_ba, used by
    LoopCloser when SystemConfig.dist_ba_devices > 1) must agree with the
    same solve on a 1-device mesh — sharding the factor table over the
    8-virtual-device mesh changes the math only by reduction order."""
    from ms_slam_tpu.ops.orb import OrbConfig
    from ms_slam_tpu.pipeline.frontend import Calib
    from test_map_state import small_map

    rng = np.random.default_rng(11)
    ms = small_map(rng)
    calib = Calib(model=cameras.PINHOLE, params=(100.0, 100.0, 50.0, 50.0),
                  bf=15.0, width=100, height=100, th_depth=6.0, fps=10.0)
    orb_cfg = OrbConfig(n_features=16, n_levels=4)

    mesh8 = dist_ba.make_mesh(8)
    mesh1 = dist_ba.make_mesh(1)
    ms8 = dist_ba.dist_global_ba(ms, calib, orb_cfg, 0, mesh8, n_iters=4)
    ms1 = dist_ba.dist_global_ba(ms, calib, orb_cfg, 0, mesh1, n_iters=4)
    np.testing.assert_allclose(np.asarray(ms8.kf_R), np.asarray(ms1.kf_R),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ms8.kf_t), np.asarray(ms1.kf_t),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ms8.mp_pos), np.asarray(ms1.mp_pos),
                               atol=1e-4)
