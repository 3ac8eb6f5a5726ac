#!/usr/bin/env python
"""Probe the host<->device tunnel: RTT, bandwidth, async-copy behavior,
concurrency, and per-kernel device time for the hot per-frame kernels.

Diagnostic only (not a driver-run bench). Prints a small report.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, n=20, warmup=3):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # --- RTT: tiny blocking get
    x_small = jnp.zeros((42,), jnp.float32).block_until_ready()
    t = timeit(lambda: np.asarray(x_small))
    print(f"tiny get (42 floats):        {t*1e3:8.2f} ms")

    # --- tiny put
    h_small = np.zeros((42,), np.float32)
    t = timeit(lambda: jax.device_put(h_small).block_until_ready())
    print(f"tiny put (blocking):         {t*1e3:8.2f} ms")

    # --- 1MB put (the per-frame image upload)
    img = np.zeros((2, 384, 1248), np.uint8)
    t = timeit(lambda: jax.device_put(img).block_until_ready())
    print(f"1MB put (blocking):          {t*1e3:8.2f} ms "
          f"({img.nbytes/t/1e6:.0f} MB/s)")

    # --- 1MB get
    d_img = jax.device_put(img).block_until_ready()
    t = timeit(lambda: np.asarray(d_img))
    print(f"1MB get (blocking):          {t*1e3:8.2f} ms "
          f"({img.nbytes/t/1e6:.0f} MB/s)")

    # --- async copy then get: does copy_to_host_async prefetch?
    y = jnp.zeros((42,), jnp.float32).block_until_ready()

    def async_then_get():
        y.copy_to_host_async()
        time.sleep(0.06)          # give the async copy time to land
        return np.asarray(y)
    t = timeit(async_then_get, n=10)
    print(f"get after async+60ms sleep:  {(t-0.06)*1e3:8.2f} ms residual")

    # --- concurrent tiny gets from 4 threads: does the tunnel pipeline?
    from concurrent.futures import ThreadPoolExecutor
    xs = [jnp.full((42,), i, jnp.float32).block_until_ready()
          for i in range(8)]
    pool = ThreadPoolExecutor(4)

    def burst():
        futs = [pool.submit(np.asarray, a) for a in xs]
        for f in futs:
            f.result()
    t = timeit(burst, n=10)
    print(f"8 tiny gets via 4 threads:   {t*1e3:8.2f} ms total "
          f"({t/8*1e3:.2f} ms/get effective)")

    # one batched get of 8 handles
    t = timeit(lambda: jax.device_get(tuple(xs)), n=10)
    print(f"8 tiny gets in one call:     {t*1e3:8.2f} ms total")

    # --- per-kernel device time on the real shapes
    from ms_slam_tpu.models.map_state import MapConfig, empty_map
    from ms_slam_tpu.ops.orb import OrbConfig
    from ms_slam_tpu.pipeline.frontend import Calib, process_stereo_stacked
    from ms_slam_tpu.pipeline import tracking_ops as to
    from ms_slam_tpu.utils import synth

    H, W = 384, 1248
    FX = 718.856
    BL = 0.537
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    calib = Calib(model=0, params=(FX, FX, W / 2, H / 2),
                  bf=FX * BL, width=W, height=H, th_depth=BL * 40, fps=10.0)
    orb_cfg = OrbConfig(n_features=2048, n_levels=8)
    mc = MapConfig(max_kf=128, max_mp=32768, n_feat=2048,
                   local_mp_cap=4096, window_kf=6)

    rng = np.random.default_rng(0)
    world = synth.CorridorWorld(rng, half_w=6.0, y_floor=1.7)
    T = np.eye(4)
    im_l, im_r = world.render_stereo(K, T, BL, H, W)
    stacked = jnp.asarray(np.stack([im_l, im_r]).astype(np.uint8))

    frame = process_stereo_stacked(stacked, calib, orb_cfg)
    jax.block_until_ready(frame)
    t = timeit(lambda: jax.block_until_ready(
        process_stereo_stacked(stacked, calib, orb_cfg)), n=20)
    print(f"frontend kernel (device):    {t*1e3:8.2f} ms")

    ms = empty_map(mc)
    # populate a tracking-representative map: one keyframe + points
    from ms_slam_tpu.pipeline.system import System, SystemConfig
    cfg = SystemConfig(calib=calib, orb=orb_cfg, map=mc,
                       min_init_depth_points=300, max_frames_between_kf=10)
    slam = System(cfg)
    poses = synth.make_trajectory(40, "forward")
    for i, Tp in enumerate(poses):
        a, b = world.render_stereo(K, Tp, BL, H, W)
        slam.track_stereo(a, b, 0.1 * i)
    slam._flush_pipeline()
    ms = slam.ms
    lm = slam.last_matched
    R_l = jnp.asarray(slam.last_R)
    t_l = jnp.asarray(slam.last_t)

    def run_track():
        out = to.track_full(
            ms, calib, orb_cfg, frame, R_l, t_l, R_l, t_l,
            jnp.asarray(False), lm, jnp.asarray(slam.ref_kf),
            mc.local_mp_cap)
        jax.block_until_ready(out.stats)
        return out
    # track_full donates ms; pass a copy each time to keep ms alive
    import jax.tree_util as jtu

    def run_track_copy():
        ms2 = jtu.tree_map(lambda a: a + 0 if hasattr(a, 'dtype') else a, ms)
        out = to.track_full(
            ms2, calib, orb_cfg, frame, R_l, t_l, R_l, t_l,
            jnp.asarray(False), lm, jnp.asarray(slam.ref_kf),
            mc.local_mp_cap)
        jax.block_until_ready(out.stats)
    run_track_copy()
    t = timeit(run_track_copy, n=10)
    print(f"track_full kernel+copy:      {t*1e3:8.2f} ms")

    # steady-state dispatch loop: how fast can device+tunnel sustain
    # dispatch->dispatch without ANY per-frame blocking fetch
    frames = []
    for i, Tp in enumerate(synth.make_trajectory(32, "forward")):
        a, b = world.render_stereo(K, Tp, BL, H, W)
        frames.append(np.stack([a, b]).astype(np.uint8))

    def pipeline_nofetch():
        msX = jtu.tree_map(lambda a: a + 0 if hasattr(a, 'dtype') else a, ms)
        lmX, RX, tX = lm, R_l, t_l
        outs = []
        t0 = time.perf_counter()
        for fr in frames:
            fd = process_stereo_stacked(jnp.asarray(fr), calib, orb_cfg)
            out = to.track_full(msX, calib, orb_cfg, fd, RX, tX, RX, tX,
                                jnp.asarray(True), lmX,
                                jnp.asarray(slam.ref_kf), mc.local_mp_cap)
            msX, lmX, RX, tX = out.ms, out.matched_mp, out.R, out.t
            outs.append(out.stats)
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / len(frames)
    pipeline_nofetch()
    t = min(pipeline_nofetch() for _ in range(3))
    print(f"dispatch-only pipeline:      {t*1e3:8.2f} ms/frame "
          f"({1/t:.1f} fps upper bound)")


if __name__ == "__main__":
    main()
