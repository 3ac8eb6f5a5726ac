"""Visual-inertial optimization kernels on simulated trajectories."""
import jax
import jax.numpy as jnp
import numpy as np

from ms_slam_tpu.ops import cameras, imu, inertial_opt, lie

from test_imu import simulate, G

PIN = cameras.pad_params([400.0, 400.0, 320.0, 240.0])
BF = 40.0


def test_pose_vel_bias_recovery(rng):
    meas, Rs, vs, ps = simulate(rng, n=100, dt=0.005)
    n = meas.shape[0]
    st = imu.integrate(jnp.zeros(6), jnp.asarray(meas), jnp.ones(n, bool),
                       jnp.asarray(1e-3), jnp.asarray(1e-2),
                       jnp.asarray(1e-6), jnp.asarray(1e-5))
    # visual landmarks seen from the true final pose (camera = body)
    N = 200
    X = rng.uniform(-4, 4, (N, 3))
    X[:, 2] += 10.0
    R2, v2, p2 = Rs[-1], vs[-1], ps[-1]
    R_cw = R2.T
    t_cw = -R_cw @ p2
    Xc = (R_cw @ X.T).T + t_cw
    ok = Xc[:, 2] > 1.0
    uv = np.array(cameras.pinhole_project(PIN, jnp.asarray(Xc)))
    uv += rng.normal(0, 0.3, uv.shape)
    ur = uv[:, 0] - BF / np.maximum(Xc[:, 2], 1e-3)

    # perturb the state guess
    dR = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.03, 0.01])))
    res = inertial_opt.pose_vel_bias_optimize(
        cameras.PINHOLE, PIN, jnp.asarray(BF),
        jnp.eye(3), jnp.zeros(3),                  # camera == body
        jnp.asarray(Rs[0]), jnp.asarray(ps[0]), jnp.asarray(vs[0]),
        jnp.zeros(3), jnp.zeros(3), st,
        jnp.asarray(dR @ R2), jnp.asarray(p2 + [0.05, -0.04, 0.06]),
        jnp.asarray(v2 + [0.1, 0.05, -0.1]),
        jnp.asarray(X), jnp.asarray(uv), jnp.asarray(ur),
        jnp.ones(N), jnp.asarray(ok),
        walk_info=jnp.full(6, 1e6))
    ang = np.degrees(np.arccos(np.clip(
        (np.trace(np.asarray(res.R_wb) @ R2.T) - 1) / 2, -1, 1)))
    assert ang < 0.1, ang
    assert np.linalg.norm(np.asarray(res.p_wb) - p2) < 0.02
    assert np.linalg.norm(np.asarray(res.v) - v2) < 0.05
    assert int(res.n_inliers) > 0.9 * ok.sum()


def test_inertial_init_gravity_and_bias(rng):
    """Simulate a tilted-gravity world: the initializer must recover the
    gravity direction and gyro bias from poses + preintegrations."""
    bg_true = np.array([0.004, -0.006, 0.003])
    K = 8
    seg = 40
    meas, Rs, vs, ps = simulate(rng, n=K * seg, dt=0.005, bg=bg_true)
    # keyframe states every `seg` samples + per-segment preintegration
    kf_R = np.stack([Rs[i * seg] for i in range(K)])
    kf_p = np.stack([ps[i * seg] for i in range(K)])
    sts = []
    for i in range(K - 1):
        chunk = meas[i * seg:(i + 1) * seg]
        sts.append(imu.integrate(
            jnp.zeros(6), jnp.asarray(chunk), jnp.ones(seg, bool),
            jnp.asarray(1e-3), jnp.asarray(1e-2), jnp.asarray(1e-6),
            jnp.asarray(1e-5)))
    stack = jax.tree.map(lambda *a: jnp.stack(a), *sts)
    res = inertial_opt.inertial_init(
        jnp.asarray(kf_R), jnp.asarray(kf_p), stack,
        prior_g=jnp.asarray(1e2), prior_a=jnp.asarray(1e5))
    # gravity in world is exactly -z here => R_wg ~ identity rotation of g
    g_est = np.asarray(res.R_wg) @ np.array([0, 0, -imu.GRAVITY])
    cos = g_est @ G / (np.linalg.norm(g_est) * np.linalg.norm(G))
    assert cos > 0.9999, g_est
    np.testing.assert_allclose(np.asarray(res.bg), bg_true, atol=5e-4)
    # velocities close to truth
    v_err = np.linalg.norm(np.asarray(res.vels)[:-1]
                           - np.stack([vs[i * seg] for i in range(K - 1)]),
                           axis=1)
    assert np.median(v_err) < 0.05, v_err
