"""Benchmark: stereo tracking throughput on KITTI-sized frames.

Runs the full per-frame pipeline (ORB frontend + stereo + local-map
tracking + keyframe/local-mapping work amortized) on a rendered synthetic
world at KITTI geometry (1241x376 -> padded 1248x384, 2048 features,
reference config Examples/Stereo/KITTI00-02.yaml) and reports steady-state
frames/s.

Baseline: the reference runs KITTI stereo in real time on CPU; ORB-SLAM3's
published mean stereo tracking time on KITTI-class sequences is ~40ms/frame
(~25 fps). vs_baseline = our_fps / 25.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_FPS = 25.0


def main():
    import jax

    from ms_slam_tpu.models.map_state import MapConfig
    from ms_slam_tpu.ops.orb import OrbConfig
    from ms_slam_tpu.pipeline.frontend import Calib
    from ms_slam_tpu.pipeline.system import System, SystemConfig
    from ms_slam_tpu.utils import synth

    H, W = 384, 1248
    FX = 718.856
    BASELINE = 0.537  # KITTI stereo baseline (m)
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])

    calib = Calib(model=0, params=(FX, FX, W / 2, H / 2),
                  bf=FX * BASELINE, width=W, height=H,
                  th_depth=BASELINE * 40, fps=10.0)
    cfg = SystemConfig(
        calib=calib,
        orb=OrbConfig(n_features=2048, n_levels=8),
        map=MapConfig(max_kf=128, max_mp=32768, n_feat=2048,
                      local_mp_cap=4096, window_kf=6),
        min_init_depth_points=300,
        max_frames_between_kf=10,
    )

    rng = np.random.default_rng(0)
    world = synth.PlaneWorld(rng, z_wall=25.0, y_floor=1.7, tex_scale=0.04)
    n_frames = 40
    poses = synth.make_trajectory(n_frames, "forward")

    t0 = time.time()
    frames = [world.render_stereo(K, T, BASELINE, H, W) for T in poses]
    print(f"# rendered {n_frames} frames in {time.time()-t0:.1f}s "
          f"on {jax.devices()[0].platform}", file=sys.stderr)

    slam = System(cfg)
    # warmup / compile
    for i in range(3):
        slam.track_stereo(frames[i][0], frames[i][1], 0.1 * i)
    t0 = time.time()
    n_meas = 0
    for i in range(3, n_frames):
        nxt = frames[i + 1] if i + 1 < n_frames else None
        slam.track_stereo(frames[i][0], frames[i][1], 0.1 * i,
                          next_images=nxt)
        n_meas += 1
    dt = time.time() - t0
    fps = n_meas / dt
    print(f"# tracked {n_meas} frames in {dt:.2f}s; state={slam.state} "
          f"kf={slam.keyframes_in_map()} mp={slam.map_points_in_map()}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "stereo_track_fps_kitti_size",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
