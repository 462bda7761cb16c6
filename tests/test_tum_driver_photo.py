"""Full driver e2e on REAL photographic imagery (VERDICT round-1 item 2/6):
render a photo-textured scene to a TUM-format sequence ON DISK (rgb/ +
rgb.txt), run the `examples/mono_tum.py` driver over it — YAML settings
parse, file-based frame loading, tracking, trajectory export — and check
the recovered trajectory against the exact ground truth.

This is the reference's integration-test shape (`Examples/Monocular/
mono_tum.cc`: LoadImages -> System -> TrackMonocular loop -> save
trajectory) with the evaluation the reference leaves external."""
import os
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_mono_tum_driver_on_photo_sequence(tmp_path):
    from plslam_tpu.datasets import synthetic, textured

    n = 28
    fx = fy = 500.0
    scene = textured.make_photo_scene(seed=5, fx=fx, fy=fy)
    Ts_gt = synthetic.trajectory(n, "orbit", amplitude=1.0)
    frames = [synthetic.render(scene, T) for T in Ts_gt]
    tss = [i / 30.0 for i in range(n)]
    seq = tmp_path / "seq"
    textured.write_tum_sequence(str(seq), frames, tss)
    assert (seq / "rgb.txt").exists()

    yaml_path = tmp_path / "settings.yaml"
    yaml_path.write_text(f"""%YAML:1.0
Camera.fx: {fx}
Camera.fy: {fy}
Camera.cx: 320.0
Camera.cy: 240.0
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: 640
Camera.height: 480
Camera.fps: 30.0
Camera.RGB: 1
ORBextractor.nFeatures: 512
ORBextractor.nLevels: 3
ORBextractor.scaleFactor: 1.2
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
LINEextractor.nFeatures: 64
LINEextractor.nLevels: 1
LINEextractor.scaleFactor: 1.2
LINEextractor.min_line_length: 0.0
""")

    out = tmp_path / "CameraTrajectory.txt"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import examples.mono_tum as mono_tum
    argv = sys.argv
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)  # driver writes KeyFrameTrajectory.txt to cwd
        sys.argv = ["mono_tum.py", str(yaml_path), str(seq), str(out)]
        rc = mono_tum.main()
    finally:
        sys.argv = argv
        os.chdir(cwd)
    assert rc == 0
    assert out.exists()

    # parse the exported TUM trajectory: ts tx ty tz qx qy qz qw
    rows = [l.split() for l in out.read_text().splitlines() if l.strip()]
    assert len(rows) >= n - 6, f"only {len(rows)} trajectory rows"
    by_ts = {round(float(r[0]), 6): np.array([float(v) for v in r[1:4]])
             for r in rows}
    # camera centers from GT (Twc translation == exported TUM convention)
    idx = [i for i in range(n) if round(tss[i], 6) in by_ts]
    est_c = np.stack([by_ts[round(tss[i], 6)] for i in idx])
    gt_c = np.stack([-Ts_gt[i][:3, :3].T @ Ts_gt[i][:3, 3] for i in idx])

    # Sim3-align (mono scale is free) and compare
    mu_e, mu_g = est_c.mean(0), gt_c.mean(0)
    E, G = est_c - mu_e, gt_c - mu_g
    U, D, Vt = np.linalg.svd(G.T @ E)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    s = (D * np.diag(S)).sum() / max((E * E).sum(), 1e-12)
    ate = np.sqrt((np.linalg.norm((s * (R @ E.T)).T - G, axis=1) ** 2).mean())
    span = np.linalg.norm(gt_c.max(0) - gt_c.min(0))
    assert ate < 0.05 * span + 0.02, (ate, span)
