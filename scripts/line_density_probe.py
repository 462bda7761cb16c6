"""How many lines does the detector yield on the photo head-to-head
frames, and which detection knob limits the count? (docs/ROADMAP.md
accuracy lever 2: reference tracks ~40 line inliers/frame there, the
rebuild ~11.)

Sweeps detect_lines parameters on a few frames of SEQ_DIR (default
/tmp/refseq2, rendered by scripts/ref_compare.py) and prints valid-slot
counts + length percentiles per setting — detection-side evidence before
touching match/creation gates.

Usage: SEQ_DIR=/tmp/refseq2 python scripts/line_density_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from plslam_tpu.datasets import tum
    from plslam_tpu.ops import lines as line_ops

    seq = os.environ.get("SEQ_DIR", "/tmp/refseq2")
    frames = []
    for i, (ts, img) in enumerate(tum.frames(seq)):
        if i % 60 == 0:
            frames.append(np.asarray(img, np.float32))
        if len(frames) == 5:
            break

    sweeps = [
        {},                                       # current defaults
        {"min_length": 16.0},
        {"min_length": 12.0},
        {"block": 4},
        {"block": 4, "min_length": 16.0},
        {"coherence_th": 0.6},
        {"mag_th": 2.0},
        {"block": 4, "coherence_th": 0.6, "min_length": 16.0},
    ]
    for kw in sweeps:
        counts, lens = [], []
        for img in frames:
            lf = line_ops.detect_lines(img, n_out=256, **kw)
            v = np.asarray(lf.valid)
            counts.append(int(v.sum()))
            a = np.asarray(lf.uv_a)[v]
            b = np.asarray(lf.uv_b)[v]
            lens.extend(np.linalg.norm(a - b, axis=-1).tolist())
        lens = np.array(lens) if lens else np.zeros(1)
        print(f"{kw!r:58} n={np.mean(counts):6.1f} "
              f"len p50={np.percentile(lens, 50):5.1f} "
              f"p10={np.percentile(lens, 10):5.1f}", flush=True)


if __name__ == "__main__":
    main()
