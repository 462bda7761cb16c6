"""Find a circuit fixture where the DEFAULT config (tri_covis on) still
fires an EXPLICIT loop closure (VERDICT r4 item 4).

tri_covis triangulation rebinds short circuits into the first-pass map
through the covisibility graph, absorbing the drift explicit closure
exists to correct. Longer circuits / lower-overlap revisits accumulate
drift faster than data association can absorb it. This probe sweeps
circuit length/radius and reports whether the explicit stack fired.

Usage: python scripts/default_loop_fixture_probe.py n amplitude [fx]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

from plslam_tpu.datasets import synthetic  # noqa: E402
from plslam_tpu.models.system import System, SLAMConfig  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    amp = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    fx = float(sys.argv[3]) if len(sys.argv) > 3 else 512.0
    if "--photo" in sys.argv:
        # the r4 head-to-head geometry: closed photo room, outward-looking
        # circle (opposite headings share nothing -> revisit reachable only
        # through place recognition). Rendered at fx=500; `fx` is the
        # TRACKING intrinsic, so fx != 500 injects the drift-forcing
        # calibration bias (like the box fixture's 512 vs 500).
        from plslam_tpu.datasets import textured
        scene = textured.make_photo_scene(seed=5, fx=500.0, fy=500.0,
                                          layout="room")
    else:
        scene = synthetic.make_scene(seed=7, layout="box")
    Ts_gt = synthetic.trajectory(n, "circle", amplitude=amp)
    frames = [synthetic.render(scene, T) for T in Ts_gt]
    print(f"n={n} amp={amp} fx={fx} photo={'--photo' in sys.argv} rendered",
          flush=True)

    cfg = SLAMConfig(fx=fx, fy=fx, cx=320.0, cy=240.0,
                     k1=0, k2=0, p1=0, p2=0, k3=0,
                     n_features=512, n_levels=3,
                     max_kf=64, max_pt=8192, max_ln=256, n_lf=64,
                     ba_window=5, ba_points=1536,
                     kf_max_interval=3, kf_min_interval=2,
                     use_loop_closing=True, grow_map=True)
    slam = System(cfg)
    t0 = time.time()
    for i, img in enumerate(frames):
        slam.track_monocular(img, i / 30.0)
        if i % 30 == 0:
            st = slam.stats[-1] if slam.stats else {}
            print(f"  f{i} state={slam.state} inl={st.get('inliers')} "
                  f"kf={slam.n_kf_host} loops={slam.loop_closer.n_loops}",
                  flush=True)
    slam.flush()
    lc = slam.loop_closer
    n_kf = slam.n_kf_host
    fid = np.asarray(slam.ms.kf_frame_id)[:n_kf]
    ate = synthetic.ate_rmse(np.asarray(slam.ms.kf_T)[:n_kf], Ts_gt[fid])
    print(f"DONE n_loops={lc.n_loops} last={getattr(lc, 'last_closure', None)}"
          f" gba={slam.n_gba_done} kf={n_kf} ate={ate:.4f} "
          f"wall={time.time() - t0:.0f}s", flush=True)
    if lc.n_loops:
        k, c = lc.last_closure
        n_pre = min(k + 1, n_kf)
        ate_pre = synthetic.ate_rmse(lc.pre_correction_kf_T[:n_pre],
                                     Ts_gt[fid][:n_pre])
        ate_post = synthetic.ate_rmse(lc.post_correction_kf_T[:n_pre],
                                      Ts_gt[fid][:n_pre])
        print(f"  closure ({k},{c}): ate_pre={ate_pre:.4f} "
              f"ate_post={ate_post:.4f}", flush=True)


if __name__ == "__main__":
    main()
