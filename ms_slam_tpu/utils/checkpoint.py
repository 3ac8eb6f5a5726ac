"""Map checkpoint / resume.

The reference scaffolds atlas save/load via Boost serialization but ships it
disabled (/root/reference/src/System.cc:488-492 commented out; SURVEY §5
"Checkpoint / resume"). Here it is a real feature: the whole MapState pytree
plus host cursors and stage state serialize to one compressed npz; loading
reconstructs a System that can keep tracking or relocalize against the
saved map. This is also the natural unit-test fixture format.
"""
from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from ..models.map_state import MapState

FORMAT_VERSION = 1


def md5_of_file(path: str) -> str:
    """Hex MD5 of a file (ref System::CalculateCheckSum,
    /root/reference/src/System.cc:1102-1140, used there to fingerprint the
    vocabulary; here useful for checkpoint integrity)."""
    import hashlib
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def save_map(path: str, system) -> None:
    arrays = {f"ms_{k}": np.asarray(v)
              for k, v in system.ms._asdict().items()}
    # compaction at rest (the EraseBadDescriptor analog for durable
    # storage, ref src/KeyFrame.cc:311-361): dead pool slots carry stale
    # bytes — zero them so the compressed checkpoint's size tracks the
    # LIVE (post-sparsification) map, the reference's headline memory
    # metric (README.md:29)
    kfv = arrays["ms_kf_valid"]
    kpv = arrays["ms_kp_valid"] & kfv[:, None]
    mpv = arrays["ms_mp_valid"]
    for k, a in arrays.items():
        name = k[3:]
        if name.startswith("kp_") and name != "kp_valid":
            arrays[k] = np.where(
                kpv.reshape(kpv.shape + (1,) * (a.ndim - 2)), a, 0)
        elif name == "obs_mp":
            arrays[k] = np.where(kpv, a, -1)
        elif (name.startswith("mp_")
                and name not in ("mp_valid", "mp_quarantine")):
            # (mp_quarantine survives: it guards freed slots on resume)
            arrays[k] = np.where(
                mpv.reshape(mpv.shape + (1,) * (a.ndim - 1)), a, 0)
    meta = {
        "version": FORMAT_VERSION,
        "n_kf": system.n_kf,
        "n_mp": system.n_mp,
        "kf_ord": system.kf_ord,
        "kf_free": list(system.kf_free),
        "kf_order": list(system.kf_order),
        "frame_id": system.frame_id,
        "state": system.state,
        "ref_kf": system.ref_kf,
        "sparsifier_done": sorted(system._sparsifier.done)
        if system._sparsifier else [],
        "db_present": np.where(system.kf_db.present)[0].tolist()
        if system.kf_db is not None else [],
    }
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    if system.kf_db is not None:
        arrays["db_rows"] = np.asarray(system.kf_db.rows)
    np.savez_compressed(path, **arrays)


def load_map(path: str, system) -> None:
    """Restore a saved map into a freshly constructed System with matching
    static configuration."""
    data = np.load(path)
    meta = json.loads(bytes(data["meta_json"]).decode())
    if meta["version"] != FORMAT_VERSION:
        raise ValueError(f"checkpoint version {meta['version']} != "
                         f"{FORMAT_VERSION}")
    fields = {k[3:]: jnp.asarray(v) for k, v in data.items()
              if k.startswith("ms_")}
    system.ms = MapState(**fields)
    system._obs_dirty = True
    system.n_kf = meta["n_kf"]
    system.n_mp = meta["n_mp"]
    system.kf_ord = meta.get("kf_ord", meta["n_kf"])
    system.kf_free = list(meta.get("kf_free", []))
    system.kf_order = list(meta.get("kf_order", range(meta["n_kf"])))
    system.frame_id = meta["frame_id"]
    system.ref_kf = meta["ref_kf"]
    system.state = "LOST"   # must relocalize against the loaded map
    if system._sparsifier is not None:
        system._sparsifier.done = set(meta["sparsifier_done"])
    if system.kf_db is not None and "db_rows" in data:
        system.kf_db.rows = jnp.asarray(data["db_rows"])
        for i in meta["db_present"]:
            system.kf_db.present[i] = True
