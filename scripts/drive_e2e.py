"""E2E drive: rendered image pair -> extract -> match -> init -> pose opt."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from plslam_tpu.geometry import se3, camera
from plslam_tpu.ops import extract, hamming
from plslam_tpu.solvers import twoview
from plslam_tpu.optim import pose_opt
from plslam_tpu.datasets import synthetic

scene = synthetic.make_scene(seed=3)
cam = camera.Camera.create(fx=500., fy=500., cx=320., cy=240.)
K = scene.K
T1 = np.eye(4, dtype=np.float32)
xi_true = np.array([0.01, -0.03, 0.005, 0.25, 0.02, 0.01], np.float32)
T2 = np.asarray(se3.se3_exp(jnp.asarray(xi_true)))
img1, img2 = synthetic.render(scene, T1), synthetic.render(scene, T2)

cfg = extract.ExtractorConfig(n_features=768, n_levels=4)
f1 = extract.extract_points(jnp.asarray(img1), cfg)
f2 = extract.extract_points(jnp.asarray(img2), cfg)
print("valid feats:", int(f1.valid.sum()), int(f2.valid.sum()))

idx, ok, best = hamming.hamming_nn_match(f1.desc, f2.desc, max_dist=60, nn_ratio=0.9)
okm = np.asarray(ok) & np.asarray(f1.valid) & np.asarray(f2.valid)[np.asarray(idx)]
print("matches:", okm.sum())

res = twoview.initialize_two_view(jax.random.PRNGKey(0), f1.uv, f2.uv[idx],
                                  jnp.asarray(okm), jnp.asarray(K))
print("init success:", bool(res.success), "useH:", bool(res.used_homography), "n_good:", int(res.n_good))
R_err = np.degrees(np.arccos(np.clip((np.trace(np.asarray(res.R).T @ T2[:3,:3])-1)/2,-1,1)))
t_est = np.array(res.t); t_est /= np.linalg.norm(t_est)
t_true = T2[:3,3]/np.linalg.norm(T2[:3,3])
t_err = np.degrees(np.arccos(np.clip(abs(t_est@t_true),-1,1)))
print(f"Rerr {R_err:.3f} deg  t-dir err {t_err:.3f} deg")

good = np.asarray(res.good)
scalef = np.linalg.norm(T2[:3,3])
Xs = np.asarray(res.X) * scalef
eln = pose_opt.PoseObs.empty_lines(4)
obs = pose_opt.PoseObs(jnp.asarray(Xs), f2.uv[idx], jnp.ones(len(Xs)), jnp.asarray(good), *eln)
xi_pert = xi_true + np.array([0.02,-0.01,0.015,0.05,-0.04,0.03],np.float32)
out = pose_opt.pose_optimize(cam, se3.se3_exp(jnp.asarray(xi_pert)), obs)
dT = np.asarray(se3.se3_log(jnp.asarray(np.asarray(out.T) @ np.linalg.inv(T2))))
print("pose-opt inliers:", int(out.n_inliers), "/", int(good.sum()))
print(f"pose-opt err: rot {np.linalg.norm(dT[:3]):.5f} rad  trans {np.linalg.norm(dT[3:]):.5f} m")
assert bool(res.success) and R_err < 0.5 and t_err < 10.0
assert np.linalg.norm(dT[:3]) < 0.01 and np.linalg.norm(dT[3:]) < 0.05
print("E2E DRIVE OK")
