"""Long-trajectory demonstration: 300+ keyframes through dynamic map
growth (VERDICT round-1 item 5 'done' criterion).

Drives a long forward+weave synthetic sequence with a small initial map
capacity and keyframes on a fixed cadence; reports growth events, final
capacities, landmark counts, and wall time. Run on TPU (default) or CPU
(--cpu, smaller).
"""
import os
import sys
import time

sys.path.insert(0, ".")
if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from plslam_tpu.datasets import synthetic
    from plslam_tpu.models.system import System, SLAMConfig

    small = "--cpu" in sys.argv
    n = 240 if small else 700
    kf_iv = 2  # every-frame keyframing creates shallow-parallax
    # landmarks (cf tests/test_growth.py) — 2 is the densest healthy cadence

    # slow orbit so the scene stays in view over a long run
    scene = synthetic.make_scene(seed=9)
    Ts = synthetic.trajectory(n, "orbit", amplitude=0.8)
    frames = [synthetic.render(scene, T) for T in Ts]
    print(f"rendered {n} frames", flush=True)

    cfg = SLAMConfig(
        fx=500.0, fy=500.0, cx=320.0, cy=240.0,
        k1=0, k2=0, p1=0, p2=0, k3=0,
        n_features=256 if small else 512, n_levels=2 if small else 3,
        max_kf=16, max_pt=2048, max_ln=128, n_lf=64,   # small initial caps
        ba_window=5, ba_points=1024, ba_lines=64,
        kf_max_interval=kf_iv, kf_min_interval=kf_iv,
        kf_ref_ratio=2.0,  # always-weak c2: fixed keyframe cadence
        use_lines=os.environ.get("NO_LINES", "") == "",
        # full line weight in BOTH variants: the dense-cadence stress
        # regime's tiny-baseline 2-view lines (metric (b/z)sin(theta)
        # ~ 5e-5) are now rejected by the triangulation-conditioning
        # creation gate in mapping.create_new_lines (VERDICT r2 #2), so
        # the former LINFO=0.25 escape hatch is gone.
        track_line_info=float(os.environ.get("LINFO", "1.0")),
        use_loop_closing=True, grow_map=True,
    )
    slam = System(cfg)
    t0 = time.perf_counter()
    for i, img in enumerate(frames):
        slam.track_monocular(img, i / 30.0)
        if i % 50 == 49:
            print(f"frame {i+1}: kf={slam.n_kf_host} growths={slam.n_growths} "
                  f"caps=({slam.map_cfg.max_kf},{slam.map_cfg.max_pt},"
                  f"{slam.map_cfg.max_ln}) {time.perf_counter()-t0:.0f}s",
                  flush=True)
    slam.flush()
    wall = time.perf_counter() - t0

    est = {ts: T for ts, T in slam.trajectory}
    idx = [i for i in range(n) if (i / 30.0) in est]
    ate = synthetic.ate_rmse(np.stack([est[i / 30.0] for i in idx]), Ts[idx])
    print(f"DONE: {n} frames in {wall:.0f}s ({n/wall:.1f} fps incl. "
          f"mapping+growth recompiles)")
    print(f"keyframes={slam.n_kf_host} map_points={slam.n_map_points()} "
          f"growths={slam.n_growths} "
          f"caps=({slam.map_cfg.max_kf},{slam.map_cfg.max_pt},"
          f"{slam.map_cfg.max_ln}) loops={slam.loop_closer.n_loops} "
          f"ate={ate:.4f}")
    # the small CPU variant is a STRESS probe (dense cadence, slow orbit,
    # 256 feats): it validates growth + capacity behavior, not tracking
    # robustness; the TPU variant carries the keyframe-scale goal
    assert slam.n_growths >= 3, "growth machinery did not engage"
    assert slam.n_kf_host >= (30 if small else 300), "keyframe goal not met"


if __name__ == "__main__":
    main()
