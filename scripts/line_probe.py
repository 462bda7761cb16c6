"""Probe: do line features measurably improve ATE? (VERDICT item 7 'done'
criterion: a line-rich fixture where lines ON beats lines OFF.)

Sweeps track_line_info over a point-poor / line-rich scene on CPU."""
import os
import sys

sys.path.insert(0, ".")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np


def run(frames, Ts_gt, use_lines, line_info, n_feats):
    from plslam_tpu.datasets import synthetic
    from plslam_tpu.models.system import System, SLAMConfig
    cfg = SLAMConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                     k1=0, k2=0, p1=0, p2=0, k3=0,
                     n_features=n_feats, n_levels=3,
                     max_kf=24, max_pt=4096, max_ln=256, n_lf=96,
                     ba_window=5, ba_points=1024, ba_lines=128,
                     kf_max_interval=3, kf_min_interval=3, kf_ref_ratio=2.0,
                     min_init_matches=60,  # point-poor fixture
                     use_lines=use_lines, track_line_info=line_info,
                     use_loop_closing=False)
    slam = System(cfg)
    n = len(frames)
    for i, img in enumerate(frames):
        slam.track_monocular(img, i / 30.0)
    slam.flush()
    est = {ts: T for ts, T in slam.trajectory}
    idx = [i for i in range(n) if (i / 30.0) in est]
    if len(idx) < 20:
        return float("inf"), len(idx)
    ate = synthetic.ate_rmse(np.stack([est[i / 30.0] for i in idx]),
                             Ts_gt[idx])
    return ate, len(idx)


def main():
    from plslam_tpu.datasets import synthetic
    from plslam_tpu.datasets.synthetic import Plane, Scene
    n = 40
    n_feats = int(os.environ.get("NFEATS", "256"))
    alpha = float(os.environ.get("ALPHA", "0.15"))
    scene = synthetic.make_scene(seed=3, n_lines=int(os.environ.get("NLINES", "24")))
    # LOW-TEXTURE variant (the reference's fr3_structure_notexture
    # scenario): flatten plane textures to ~±20 gray levels so corners are
    # weak, while the rendered 3D segments stay high-contrast strokes
    planes = [Plane(p.origin, p.e1, p.e2, p.scale,
                    (110.0 + (p.tex - float(p.tex.mean())) * alpha
                     ).astype(np.float32))
              for p in scene.planes]
    scene = Scene(planes, scene.lines, scene.points, scene.K,
                  scene.width, scene.height)
    Ts_gt = synthetic.trajectory(n, "orbit", amplitude=1.0)
    frames = [synthetic.render(scene, T) for T in Ts_gt]
    print(f"rendered, n_feats={n_feats} alpha={alpha}", flush=True)

    for use_lines, info in [(False, 0.0), (True, 0.25), (True, 0.5),
                            (True, 1.0)]:
        ate, tracked = run(frames, Ts_gt, use_lines, info, n_feats)
        print(f"lines={use_lines} info={info}: ate={ate:.4f} "
              f"tracked={tracked}/{n}", flush=True)


if __name__ == "__main__":
    main()
