"""Instrumented loop-closure probe: logs per-keyframe detection candidates,
Sim3-stage numbers, and per-stage keyframe ATE around a closure (before,
after essential graph, after GBA) to find which stage helps/hurts. CPU."""
import os
import sys

sys.path.insert(0, ".")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    from plslam_tpu.datasets import synthetic
    from plslam_tpu.models.system import System, SLAMConfig

    n = int(os.environ.get("N_FRAMES", "110"))
    revisit = int(os.environ.get("REVISIT", "0"))
    scene = synthetic.make_scene(seed=7, layout="box")
    Ts_gt = synthetic.trajectory(n, "circle", amplitude=2.0)
    if revisit:
        # extend past 360 deg at the same per-frame speed: the revisit
        # window gets `revisit` frames (several keyframes) instead of the
        # tail of the single lap
        Ts_gt = np.concatenate([Ts_gt, Ts_gt[:revisit]])
    frames = [synthetic.render(scene, T) for T in Ts_gt]
    print("rendered", flush=True)

    fxb = float(os.environ.get("FX", "512.0"))
    cfg = SLAMConfig(fx=fxb, fy=fxb, cx=320.0, cy=240.0,  # fixture: fx bias
                     k1=0, k2=0, p1=0, p2=0, k3=0,
                     n_features=512, n_levels=3,
                     max_kf=40, max_pt=8192, max_ln=256, n_lf=64,
                     ba_window=5, ba_points=1536,
                     kf_max_interval=3, kf_min_interval=2,
                     tri_covis=bool(int(os.environ.get("TRI_COVIS", "1"))),
                     use_loop_closing=True, grow_map=True)
    slam = System(cfg)
    lc = slam.loop_closer

    def kf_ate(ms, upto=None):
        n_kf = int(ms.n_kf)
        m = n_kf if upto is None else min(upto, n_kf)
        fid = np.asarray(ms.kf_frame_id)[:m]
        return synthetic.ate_rmse(np.asarray(ms.kf_T)[:m], Ts_gt[fid])

    orig_detect = lc.detect
    def detect_logged(ms, k):
        top_id, top_sc, rows = (np.asarray(x) for x in
                                lc._detect_inputs(ms, jnp.int32(k)))
        raw = [(int(j), round(float(s), 3)) for j, s in zip(top_id, top_sc)
               if s > 0]
        out = orig_detect(ms, k)
        if raw or out:
            print(f"k={k}: raw={raw[:5]} "
                  f"consistent={[(t[0], t[1]) for t in out]}",
                  flush=True)
        return out
    lc.detect = detect_logged

    orig_stage = lc._sim3_stage
    def stage_logged(ms, k, c, group, key):
        r = orig_stage(ms, k, c, group, key)
        n_matches, n_seed, S12, n_inl = r
        print(f"  sim3 k={int(k)} c={int(c)}: n_matches={int(n_matches)} "
              f"seed={int(n_seed)} n_inl={int(n_inl)} s={float(S12.s):.4f}",
              flush=True)
        if int(n_seed) >= 12 and int(n_inl) >= 20:
            ki, ci = int(k), int(c)
            # GT relative SE3 between the two keyframes' frames
            fid = np.asarray(ms.kf_frame_id)
            Tk_gt = Ts_gt[fid[ki]]
            Tc_gt = Ts_gt[fid[ci]]
            S_gt = Tk_gt @ np.linalg.inv(Tc_gt)   # maps cam-c -> cam-k (true)
            # estimated poses' relative (pre-correction, drifted)
            Tk = np.asarray(ms.kf_T[ki]); Tc = np.asarray(ms.kf_T[ci])
            S_est = Tk @ np.linalg.inv(Tc)
            R12 = np.asarray(S12.R)
            print(f"  sim3 accept k={ki} c={ci}: n_matches={int(n_matches)} "
                  f"n_inl={int(n_inl)} s={float(S12.s):.4f}\n"
                  f"    S12.t={np.asarray(S12.t).round(3)}\n"
                  f"    gt rel t={S_gt[:3,3].round(3)} drifted rel t={S_est[:3,3].round(3)}\n"
                  f"    rot angle: S12={np.degrees(np.arccos(np.clip((np.trace(R12)-1)/2,-1,1))):.2f} "
                  f"gt={np.degrees(np.arccos(np.clip((np.trace(S_gt[:3,:3])-1)/2,-1,1))):.2f} "
                  f"drift={np.degrees(np.arccos(np.clip((np.trace(S_est[:3,:3])-1)/2,-1,1))):.2f}",
                  flush=True)
        return r
    lc._sim3_stage = stage_logged

    orig_correct = lc.correct
    def correct_logged(ms, k, c, S_kc):
        pre = kf_ate(ms)
        out = orig_correct(ms, k, c, S_kc)
        post = kf_ate(out)
        print(f"  CORRECT k={k} c={c}: kf_ate {pre:.4f} -> {post:.4f}",
              flush=True)
        return out
    lc.correct = correct_logged

    orig_merge = slam._gba_merge
    def merge_logged(ms, sel, res, kf_T_old, start_kf):
        pre = kf_ate(ms)
        out = orig_merge(ms, sel, res, kf_T_old, start_kf)
        post = kf_ate(out)
        print(f"  GBA MERGE: kf_ate {pre:.4f} -> {post:.4f}", flush=True)
        return out
    slam._gba_merge = merge_logged

    for i, img in enumerate(frames):
        slam.track_monocular(img, i / 30.0)
    slam.flush()
    print(f"done: kf={slam.n_kf_host} n_loops={lc.n_loops} "
          f"gba={slam.n_gba_done} final_kf_ate={kf_ate(slam.ms):.4f}",
          flush=True)


if __name__ == "__main__":
    main()
