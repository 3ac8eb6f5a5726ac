"""Multi-map atlas: new map after irrecoverable loss, then map merge when
the new map revisits mapped territory (ref Tracking::CreateMapInAtlas +
LoopClosing::MergeLocal)."""
import numpy as np
import pytest

from ms_slam_tpu.models.map_state import MapConfig
from ms_slam_tpu.ops.orb import OrbConfig
from ms_slam_tpu.pipeline.frontend import Calib
from ms_slam_tpu.pipeline.system import System, SystemConfig
from ms_slam_tpu.utils import synth

H, W, FX, BL = 240, 320, 260.0, 0.15
K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])


@pytest.mark.slow
def test_new_map_and_merge(rng):
    calib = Calib(model=0, params=(FX, FX, W / 2, H / 2), bf=FX * BL,
                  width=W, height=H, th_depth=BL * 45, fps=4.0)
    cfg = SystemConfig(
        calib=calib, orb=OrbConfig(n_features=512, n_levels=4),
        map=MapConfig(max_kf=96, max_mp=12288, n_feat=512,
                      local_mp_cap=2048, window_kf=6,
                      grid_w=16, grid_h=12),
        min_init_depth_points=100, max_frames_between_kf=3,
        sparsify=True, sparsify_n=40, sparsify_window=4,
        sparsify_queue_min=2, nonlocal_kf=3,
        loop_closing=True, loop_covis_min=30,
        # force irrecoverable loss quickly: the default 5s RECENTLY_LOST
        # grace would bridge this test's short 2.2s blackout (the grace
        # path itself is covered by test_recently_lost below)
        t_recently_lost=0.3)
    slam = System(cfg)

    # instrument the merge welding BA (VERDICT r4 #8, ref MergeLocal's
    # seam-local BA with fixed scaffolding, src/LoopClosing.cc:1171):
    # seam reprojection error around the current keyframe must DROP
    # before the essential graph / global BA run
    def seam_rmse(cur):
        import jax.numpy as jnp
        from ms_slam_tpu.models import map_state as M
        from ms_slam_tpu.ops import cameras
        ms = slam.ms
        covis = np.array(M.covisibility_counts(ms, jnp.asarray(cur)))
        win = [cur] + [int(i) for i in np.argsort(-covis)
                       if covis[i] > 0][:7]
        sl = jnp.asarray(win)
        obs = ms.obs_mp[sl]
        valid = (obs >= 0) & ms.kp_valid[sl]
        X = ms.mp_pos[jnp.clip(obs, 0)]
        Xc = jnp.einsum("kij,knj->kni", ms.kf_R[sl], X) + ms.kf_t[sl][:, None]
        uv = cameras.project(calib.model, calib.params_array(),
                             Xc.reshape(-1, 3)).reshape(Xc.shape[0], -1, 2)
        e = jnp.linalg.norm(uv - ms.kp_xy[sl], axis=-1)
        ok = valid & (Xc[..., 2] > 0.05)
        return float(jnp.sqrt(jnp.sum(jnp.where(ok, e * e, 0.0))
                              / jnp.maximum(jnp.sum(ok), 1)))

    weld_log = []
    orig_weld = None

    def weld_spy(cur, match):
        before = seam_rmse(cur)
        orig_weld(cur, match)
        weld_log.append((before, seam_rmse(cur)))

    world = synth.BoxWorld(rng, half=7.0)
    # orbit: first 30 frames map, then 22 blind frames while the (virtual)
    # camera keeps moving, then re-see mapped walls and continue 20 frames
    # into a second lap so the overlap spans several keyframes (the merge
    # needs 3 consecutive verified KFs, ref LoopClosing.cc:447)
    poses = synth.make_trajectory(80, "orbit")
    poses = poses + poses[:20]
    black = np.zeros((H, W), np.float32)

    orig_weld = slam._loop_closer._weld_ba
    slam._loop_closer._weld_ba = weld_spy

    for i, T_wc in enumerate(poses):
        if 30 <= i < 52:
            im_l = im_r = black
        else:
            im_l, im_r = world.render_stereo(K, T_wc, BL, H, W)
        slam.track_stereo(im_l, im_r, 0.1 * i)

    lc = slam._loop_closer
    # the welding BA ran on every merge and reduced seam error
    assert len(weld_log) >= 1
    for before, after in weld_log:
        assert after <= before + 1e-6, (before, after)
    assert slam.active_map != 0 or slam.state == "OK"
    # a second map must have been created during the blind stretch
    assert max(slam.kf_maps) >= 1 or lc.stats.get("merges", 0) >= 1, (
        slam.kf_maps)
    # ...and merged back once the overlap was detected
    assert lc.stats.get("merges", 0) >= 1, (lc.stats, slam.kf_maps)
    # after the merge the ACTIVE map holds the majority of keyframes
    # (transient orphan maps may remain in the atlas, as in the reference —
    # non-current maps persist unless a merge stitches them)
    counts = {m: slam.kf_maps.count(m) for m in set(slam.kf_maps)}
    assert counts.get(slam.active_map, 0) >= max(counts.values()), counts
    assert slam.state == "OK"


@pytest.mark.slow
def test_cross_map_relocalization_switches_active_map(rng):
    """VERDICT r3 item 7: relocalizing onto a keyframe of ANOTHER map must
    switch the Atlas active map (ref scopes reloc candidates per map —
    DetectRelocalizationCandidates(F, pMap), include/KeyFrameDatabase.h:79;
    we allow the cross-map hit but the kf_maps/active_map labels must stay
    coherent so the inertial chain and merges reason over a correct
    boundary)."""
    calib = Calib(model=0, params=(FX, FX, W / 2, H / 2), bf=FX * BL,
                  width=W, height=H, th_depth=BL * 45, fps=4.0)
    cfg = SystemConfig(
        calib=calib, orb=OrbConfig(n_features=512, n_levels=4),
        map=MapConfig(max_kf=96, max_mp=12288, n_feat=512,
                      local_mp_cap=2048, window_kf=6,
                      grid_w=16, grid_h=12),
        min_init_depth_points=100, max_frames_between_kf=3,
        sparsify=True, sparsify_n=40, sparsify_window=4,
        sparsify_queue_min=2, nonlocal_kf=3,
        loop_closing=True, loop_covis_min=30,
        t_recently_lost=0.3)
    slam = System(cfg)
    world = synth.BoxWorld(rng, half=7.0)
    lap = synth.make_trajectory(80, "orbit")
    black = np.zeros((H, W), np.float32)

    # phase 1: map the first 30 poses (map 0; sparsified KFs enter the DB)
    script = [(T, True) for T in lap[:30]]
    # phase 2: 22 blind frames -> irrecoverable loss -> fresh map
    script += [(lap[40], False)] * 22
    # phase 3: unseen territory -> map 1 initializes and tracks
    script += [(T, True) for T in lap[52:72]]
    # phase 4: short blackout while "returning" to mapped territory
    script += [(lap[10], False)] * 3
    # phase 5: re-see map-0 territory -> cross-map relocalization
    script += [(T, True) for T in lap[10:22]]

    for i, (T_wc, visible) in enumerate(script):
        if visible:
            im_l, im_r = world.render_stereo(K, T_wc, BL, H, W)
        else:
            im_l = im_r = black
        slam.track_stereo(im_l, im_r, 0.1 * i)
    slam._flush_pipeline()

    # a second map was created during the blind stretch...
    assert max(slam.kf_maps) >= 1, slam.kf_maps
    # ...and either the cross-map reloc switched back to map 0 or a merge
    # relabeled map-1 keyframes into map 0 — in both cases the ACTIVE map
    # label must agree with the newest keyframe's label
    assert slam.state == "OK", slam.state
    newest = slam.kf_order[-1]
    assert slam.kf_maps[newest] == slam.active_map, (
        slam.active_map, slam.kf_maps[newest])
    assert slam.active_map == 0, (slam.active_map,
                                  slam._loop_closer.stats)


@pytest.mark.slow
def test_recently_lost_bridges_short_blackout(rng):
    """A blackout shorter than t_recently_lost must be bridged by the
    RECENTLY_LOST grace window (pose extrapolation + reloc retries, ref
    src/Tracking.cc:1947-2018) without abandoning the map."""
    calib = Calib(model=0, params=(FX, FX, W / 2, H / 2), bf=FX * BL,
                  width=W, height=H, th_depth=BL * 45, fps=10.0)
    cfg = SystemConfig(
        calib=calib, orb=OrbConfig(n_features=512, n_levels=4),
        map=MapConfig(max_kf=96, max_mp=12288, n_feat=512,
                      local_mp_cap=2048, window_kf=6,
                      grid_w=16, grid_h=12),
        min_init_depth_points=100, max_frames_between_kf=3,
        sparsify=True, sparsify_n=40, sparsify_window=4,
        sparsify_queue_min=2, nonlocal_kf=3,
        loop_closing=True, t_recently_lost=5.0)
    slam = System(cfg)
    world = synth.BoxWorld(rng, half=7.0)
    poses = synth.make_trajectory(60, "orbit")
    black = np.zeros((H, W), np.float32)
    saw_recently_lost = False
    for i, T_wc in enumerate(poses):
        if 30 <= i < 38:     # 0.8 s blackout, well under the 5 s grace
            im_l = im_r = black
        else:
            im_l, im_r = world.render_stereo(K, T_wc, BL, H, W)
        slam.track_stereo(im_l, im_r, 0.1 * i)
        if slam.state == "RECENTLY_LOST":
            saw_recently_lost = True
    slam.shutdown()
    assert saw_recently_lost
    assert slam.state == "OK"
    # the map was never abandoned: single map, no merge needed
    assert len(set(slam.kf_maps)) == 1 and slam.active_map == 0
