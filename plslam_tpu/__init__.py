"""plslam_tpu — a TPU-native monocular point-and-line visual SLAM framework.

A from-scratch rebuild of the capabilities of PL-SLAM (ORB-SLAM2 + LSD/LBD line
features; reference layer map in /root/repo/SURVEY.md), designed for TPU
hardware: all per-frame compute (feature extraction, descriptor matching,
RANSAC model fitting, Levenberg-Marquardt pose/structure optimization) runs as
jitted XLA programs over fixed-shape arrays, batched across camera streams and
sharded over a `jax.sharding.Mesh` for multi-chip scale-out.

Package layout
--------------
- ``geometry``  : SO3/SE3/Sim3 Lie ops, camera model, triangulation.
- ``ops``       : extraction + matching kernels (pyramid, FAST, ORB, line
                  detector, LBD, Hamming-as-matmul).
- ``solvers``   : vmapped RANSAC solvers (H/F two-view init, EPnP, Horn Sim3).
- ``optim``     : batched LM backends (pose-only, local/global BA with Schur
                  complement, Sim3 pose graph) — the g2o-layer equivalent.
- ``mapstate``  : functional map state (SoA pytrees) + covisibility + culling.
- ``models``    : the pipeline stages (frame, tracking, local mapping, loop
                  closing) and the ``System`` facade.
- ``vocab``     : TPU-native place recognition (LSH bag-of-binary-words as
                  dense matmul scoring).
- ``parallel``  : mesh construction, multi-stream batching, shardings.
- ``utils``     : config, trajectory IO, metrics (ATE/RPE), profiling.
- ``datasets``  : TUM/KITTI/EuRoC loaders + synthetic sequence generator.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry and bundle-adjustment math requires true float32 matmuls; the TPU
# default (bfloat16 passes) destroys pose accuracy. The throughput-critical
# matmuls (Hamming descriptor search) are int8 and unaffected by this knob.
_jax.config.update("jax_default_matmul_precision", "highest")

