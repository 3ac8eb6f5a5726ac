"""Jitted stereo frame processing front end.

Replaces the Frame constructor pipeline of the reference
(/root/reference/src/Frame.cc: dual-thread ORB extraction :122-124,
undistortion, grid assignment, ComputeStereoMatches :169): here one fused
jit takes the rectified pair and returns features + stereo depth on device.
The reference's left/right thread parallelism becomes batched kernels; the
64x48 feature grid is unnecessary (matching is all-pairs on the MXU).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import orb, stereo


class Calib(NamedTuple):
    """Static camera calibration (hashable -> jit static argument).

    Mirrors Settings' camera section (/root/reference/src/Settings.cc:144-:
    fx fy cx cy, stereo bf, depth threshold)."""

    model: int              # cameras.PINHOLE / cameras.KB8
    params: tuple           # up to 8 floats (fx, fy, cx, cy, k0..k3)
    bf: float               # baseline * fx
    width: int
    height: int
    th_depth: float = 35.0  # close/far stereo point threshold (ref ThDepth)
    fps: float = 10.0

    def params_array(self):
        import numpy as np
        p = np.zeros(8, np.float32)
        p[:len(self.params)] = self.params
        return jnp.asarray(p)

    @property
    def min_z(self) -> float:
        # minimum triangulable depth ~ baseline (ref mb = mbf/fx)
        return max(self.bf / self.params[0], 0.1)


class FrameData(NamedTuple):
    """Device-resident per-frame working state (ref Frame object)."""

    feats: orb.Features
    u_right: jnp.ndarray   # (N,)
    depth: jnp.ndarray     # (N,)
    sigma2: jnp.ndarray    # (N,) per-octave measurement variance


@partial(jax.jit, static_argnames=("calib", "orb_cfg"))
def process_stereo_stacked(imgs: jnp.ndarray, calib: Calib,
                           orb_cfg: orb.OrbConfig) -> FrameData:
    """Stereo frontend taking a stacked (2,H,W) uint8 pair — one
    host->device transfer (a tunneled upload costs a full round trip)."""
    return _process_stereo_impl(imgs[0], imgs[1], calib, orb_cfg)


@partial(jax.jit, static_argnames=("calib", "orb_cfg"))
def process_stereo(img_l: jnp.ndarray, img_r: jnp.ndarray,
                   calib: Calib, orb_cfg: orb.OrbConfig) -> FrameData:
    """Extract ORB on both images and stereo-match (the per-frame hot path
    ahead of tracking)."""
    return _process_stereo_impl(img_l, img_r, calib, orb_cfg)


def _process_stereo_impl(img_l, img_r, calib: Calib,
                         orb_cfg: orb.OrbConfig) -> FrameData:
    # images arrive uint8 (4x less host->device transfer) and are cast on
    # device; BOTH images extract on canvas-packed pyramids in one batch
    imgs = jnp.stack([img_l, img_r]).astype(jnp.float32)
    featsB, canvases = orb.extract_canvas_multi(imgs, orb_cfg)
    feats_l = jax.tree.map(lambda a: a[0], featsB)
    feats_r = jax.tree.map(lambda a: a[1], featsB)
    sm = stereo.match_stereo_canvas(feats_l, feats_r, canvases[0],
                                    canvases[1], imgs.shape[2],
                                    calib.bf, calib.min_z, orb_cfg)
    scale2 = jnp.asarray(
        [s * s for s in orb_cfg.level_scales()], dtype=jnp.float32)
    sigma2 = scale2[feats_l.octave]
    return FrameData(feats=feats_l, u_right=sm.u_right, depth=sm.depth,
                     sigma2=sigma2)


@partial(jax.jit, static_argnames=("calib", "orb_cfg"))
def process_rgbd(img: jnp.ndarray, depth_map: jnp.ndarray,
                 calib: Calib, orb_cfg: orb.OrbConfig) -> FrameData:
    """RGB-D frame: ORB on the gray image; each keypoint reads its depth
    from the registered depth map and synthesizes a virtual right coordinate
    uR = u - bf/d (ref Frame::ComputeStereoFromRGBD, src/Frame.cc)."""
    img = img.astype(jnp.float32)
    featsB, _ = orb.extract_canvas_multi(img[None], orb_cfg)
    feats = jax.tree.map(lambda a: a[0], featsB)
    h, w = depth_map.shape
    ui = jnp.clip(jnp.round(feats.xy[:, 0]).astype(jnp.int32), 0, w - 1)
    vi = jnp.clip(jnp.round(feats.xy[:, 1]).astype(jnp.int32), 0, h - 1)
    d = depth_map[vi, ui]
    ok = (d > 0.05) & feats.valid
    depth = jnp.where(ok, d, -1.0)
    u_right = jnp.where(ok, feats.xy[:, 0] - calib.bf / jnp.maximum(d, 1e-6),
                        -1.0)
    scale2 = jnp.asarray(
        [s * s for s in orb_cfg.level_scales()], dtype=jnp.float32)
    return FrameData(feats=feats, u_right=u_right, depth=depth,
                     sigma2=scale2[feats.octave])


@partial(jax.jit, static_argnames=("calib", "orb_cfg"))
def process_mono(img: jnp.ndarray, calib: Calib,
                 orb_cfg: orb.OrbConfig) -> FrameData:
    """Monocular frame: features only, no depth (ref the monocular Frame
    ctor, include/Frame.h:70)."""
    img = img.astype(jnp.float32)
    featsB, _ = orb.extract_canvas_multi(img[None], orb_cfg)
    feats = jax.tree.map(lambda a: a[0], featsB)
    n = feats.xy.shape[0]
    scale2 = jnp.asarray(
        [s * s for s in orb_cfg.level_scales()], dtype=jnp.float32)
    return FrameData(feats=feats,
                     u_right=jnp.full((n,), -1.0, jnp.float32),
                     depth=jnp.full((n,), -1.0, jnp.float32),
                     sigma2=scale2[feats.octave])
