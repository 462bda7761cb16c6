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

# Persistent compilation cache: compiles in this environment go through a
# remote service (~30-60s each); caching makes repeat runs start in seconds.
import os as _os

# keyed by platform: the remote compile service produces AOT artifacts for
# a different host microarchitecture — mixing them with local-CPU entries
# triggers feature-mismatch loads (SIGILL risk)
_platform_tag = _os.environ.get("JAX_PLATFORMS", "default").replace(",", "_") or "default"
_cache_dir = _os.environ.get(
    "PLSLAM_JAX_CACHE",
    _os.path.expanduser(f"~/.cache/plslam_jax_{_platform_tag}"))
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


