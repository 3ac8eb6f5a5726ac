"""Direct unit tests for projection-guided matching."""
import jax.numpy as jnp
import numpy as np

from ms_slam_tpu.ops import cameras, lie, matching

PIN = cameras.pad_params([300.0, 300.0, 160.0, 120.0])


def make_scene(rng, n_pts=64, n_feat=128):
    X = rng.uniform(-3, 3, (n_pts, 3))
    X[:, 2] += 8.0
    R, t = lie.se3_exp(jnp.asarray([0.05, 0.02, -0.03, 0.01, 0.02, 0.0]))
    Xc = np.asarray(lie.se3_apply(R, t, jnp.asarray(X)))
    uv = np.array(cameras.pinhole_project(PIN, jnp.asarray(Xc)))
    descs = rng.integers(0, 2 ** 32, (n_pts, 8), dtype=np.uint32)
    # frame features: the projections (slightly perturbed) + distractors
    f_xy = np.zeros((n_feat, 2), np.float32)
    f_desc = np.zeros((n_feat, 8), np.uint32)
    f_xy[:n_pts] = uv + rng.normal(0, 0.5, uv.shape)
    f_desc[:n_pts] = descs  # identical descriptors -> distance 0
    f_xy[n_pts:] = rng.uniform(0, 300, (n_feat - n_pts, 2))
    f_desc[n_pts:] = rng.integers(0, 2 ** 32, (n_feat - n_pts, 8),
                                  dtype=np.uint32)
    return X, descs, R, t, f_xy, f_desc, n_pts


def test_projection_matching_recovers_correspondences(rng):
    X, descs, R, t, f_xy, f_desc, n_pts = make_scene(rng)
    n_feat = f_xy.shape[0]
    cam_c = np.asarray(-jnp.matmul(R.T, t))
    vec = X - cam_c
    dist = np.linalg.norm(vec, axis=1)
    normal = vec / dist[:, None]
    pm = matching.search_by_projection(
        cameras.PINHOLE, PIN, R, t, 320, 240,
        jnp.asarray(X), jnp.asarray(normal),
        jnp.asarray(dist * 0.5), jnp.asarray(dist),
        jnp.asarray(descs), jnp.ones(len(X), bool),
        jnp.asarray(f_xy), jnp.zeros(n_feat, jnp.int32),
        jnp.asarray(f_desc), jnp.ones(n_feat, bool),
        th_radius=3.0, nn_ratio=0.9, scale_factor=1.2, n_levels=8)
    slots = np.asarray(pm.mp_slot)
    # most true correspondences found, assigned to the right feature
    correct = sum(1 for i in range(n_pts) if slots[i] == i)
    assert correct > 0.8 * n_pts, correct
    # distractor features unmatched
    assert (slots[n_pts:] == -1).all()


def test_projection_matching_radius_gate(rng):
    X, descs, R, t, f_xy, f_desc, n_pts = make_scene(rng)
    n_feat = f_xy.shape[0]
    # shift all features far away: nothing should match at small radius
    f_xy2 = f_xy + 50.0
    cam_c = np.asarray(-jnp.matmul(R.T, t))
    vec = X - cam_c
    dist = np.linalg.norm(vec, axis=1)
    normal = vec / dist[:, None]
    pm = matching.search_by_projection(
        cameras.PINHOLE, PIN, R, t, 320, 240,
        jnp.asarray(X), jnp.asarray(normal),
        jnp.asarray(dist * 0.5), jnp.asarray(dist),
        jnp.asarray(descs), jnp.ones(len(X), bool),
        jnp.asarray(f_xy2), jnp.zeros(n_feat, jnp.int32),
        jnp.asarray(f_desc), jnp.ones(n_feat, bool),
        th_radius=3.0, nn_ratio=0.9, scale_factor=1.2, n_levels=8)
    assert int(pm.n_matches) == 0
