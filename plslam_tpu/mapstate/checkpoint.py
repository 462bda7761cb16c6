"""Map checkpoint/resume — the `SaveMap/LoadMap` the reference left as a
TODO (`include/System.h:126-128`). Trivial here: the map IS a pytree of
arrays."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .state import MapState


def save_map(ms: MapState, path: str):
    np.savez_compressed(path, **{f: np.asarray(getattr(ms, f))
                                 for f in ms._fields})


def load_map(path: str) -> MapState:
    data = np.load(path)
    P = data["pt_xyz"].shape[0]
    # fields added after a checkpoint was written load as inert defaults
    defaults = {
        "pt_desc_acc": lambda: np.asarray(data["pt_desc"], np.uint8),
        "pt_desc_cnt": lambda: (data["pt_n_obs"] > 0).astype(np.int32),
        "ln_cond": lambda: np.ones(data["ln_valid"].shape[0], np.float32),
        "kf_ur": lambda: np.full(data["kf_pt_idx"].shape, -1.0, np.float32),
    }
    def get(f):
        if f in data.files:
            return jnp.asarray(data[f])
        return jnp.asarray(defaults[f]())
    return MapState(**{f: get(f) for f in MapState._fields})


def save_point_cloud(ms: MapState, path: str):
    """ASCII PLY of valid map points (`System::SavePointCloud`,
    `src/System.cc:521`)."""
    pts = np.asarray(ms.pt_xyz)[np.asarray(ms.pt_valid)]
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("end_header\n")
        for p in pts:
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
