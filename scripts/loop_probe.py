"""Probe: drive an out-and-back drifted sequence and report loop-closure
behavior (candidates, closures, ATE before/after). Used to calibrate the
loop e2e test; run on CPU or TPU."""
import os
import sys

sys.path.insert(0, ".")
if "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from plslam_tpu.datasets import synthetic
    from plslam_tpu.models.system import System, SLAMConfig

    n = int(os.environ.get("N_FRAMES", "110"))
    amp = float(os.environ.get("AMP", "2.0"))
    # 360-degree circuit in a 4-wall box: covisibility breaks mid-circuit,
    # the revisit at the end needs EXPLICIT place recognition (the fixture
    # of tests/test_loop_closure_e2e.py)
    scene = synthetic.make_scene(seed=7, layout="box")
    Ts_gt = synthetic.trajectory(n, "circle", amplitude=amp)
    frames = [synthetic.render(scene, T) for T in Ts_gt]
    print("rendered", flush=True)

    results = {}
    for use_loop in (True, False):
        cfg = SLAMConfig(fx=512.0, fy=512.0, cx=320.0, cy=240.0,  # ~2.4% fx error
                         k1=0, k2=0, p1=0, p2=0, k3=0,
                         n_features=512, n_levels=3,
                         max_kf=40, max_pt=8192, max_ln=256, n_lf=64,
                         ba_window=5, ba_points=1536,
                         kf_max_interval=3, kf_min_interval=2,
                         use_loop_closing=use_loop)
        slam = System(cfg)
        for i, img in enumerate(frames):
            slam.track_monocular(img, i / 30.0)
        slam.flush()
        est = {ts: T for ts, T in slam.trajectory}
        idx = [i for i in range(n) if (i / 30.0) in est]
        ate = synthetic.ate_rmse(np.stack([est[i / 30.0] for i in idx]),
                                 Ts_gt[idx])
        lc = slam.loop_closer
        results[use_loop] = ate
        print(f"loop={use_loop}: kf={slam.n_kf_host} ate={ate:.4f} "
              f"n_loops={(lc.n_loops if lc else 0)} "
              f"gba_done={slam.n_gba_done} growths={slam.n_growths}",
              flush=True)
    print(f"ratio (loop ON/OFF): {results[True]/max(results[False],1e-9):.3f}")


if __name__ == "__main__":
    main()
