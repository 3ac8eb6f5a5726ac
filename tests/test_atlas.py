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
                  width=W, height=H, th_depth=BL * 45, fps=10.0)
    cfg = SystemConfig(
        calib=calib, orb=OrbConfig(n_features=512, n_levels=4),
        map=MapConfig(max_kf=96, max_mp=12288, n_feat=512,
                      local_mp_cap=2048, window_kf=6,
                      grid_w=16, grid_h=12),
        min_init_depth_points=100, max_frames_between_kf=3,
        sparsify=True, sparsify_n=40, sparsify_window=4,
        sparsify_queue_min=2, nonlocal_kf=3,
        loop_closing=True)
    slam = System(cfg)
    world = synth.BoxWorld(rng, half=7.0)
    # orbit: first 30 frames map, then 22 blind frames while the (virtual)
    # camera keeps moving, then 28 frames that re-see mapped walls
    poses = synth.make_trajectory(80, "orbit")
    black = np.zeros((H, W), np.float32)

    for i, T_wc in enumerate(poses):
        if 30 <= i < 52:
            im_l = im_r = black
        else:
            im_l, im_r = world.render_stereo(K, T_wc, BL, H, W)
        slam.track_stereo(im_l, im_r, 0.1 * i)

    lc = slam._loop_closer
    assert slam.active_map != 0 or slam.state == "OK"
    # a second map must have been created during the blind stretch
    assert max(slam.kf_maps) >= 1 or lc.stats.get("merges", 0) >= 1, (
        slam.kf_maps)
    # ...and merged back once the overlap was detected
    assert lc.stats.get("merges", 0) >= 1, (lc.stats, slam.kf_maps)
    # after the merge everything is one map again
    assert len(set(slam.kf_maps)) == 1
    assert slam.state == "OK"
