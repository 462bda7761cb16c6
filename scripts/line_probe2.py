"""Lines ON (info=1.0) vs OFF across seeds on the low-texture fixture."""
import os
import sys

sys.path.insert(0, ".")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
from scripts.line_probe import run


def main():
    from plslam_tpu.datasets import synthetic
    from plslam_tpu.datasets.synthetic import Plane, Scene
    n = 40
    for seed in (3, 5, 9):
        scene = synthetic.make_scene(seed=seed, n_lines=24)
        alpha = 0.12
        planes = [Plane(p.origin, p.e1, p.e2, p.scale,
                        (110.0 + (p.tex - float(p.tex.mean())) * alpha
                         ).astype(np.float32))
                  for p in scene.planes]
        scene = Scene(planes, scene.lines, scene.points, scene.K,
                      scene.width, scene.height)
        Ts_gt = synthetic.trajectory(n, "orbit", amplitude=1.0)
        frames = [synthetic.render(scene, T) for T in Ts_gt]
        a_off, t_off = run(frames, Ts_gt, False, 0.0, 256)
        a_on, t_on = run(frames, Ts_gt, True, 1.0, 256)
        print(f"seed={seed}: OFF ate={a_off:.4f} ({t_off}) "
              f"ON ate={a_on:.4f} ({t_on}) ratio={a_on/max(a_off,1e-9):.2f}",
              flush=True)


if __name__ == "__main__":
    main()
