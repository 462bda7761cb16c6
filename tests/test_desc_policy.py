"""Representative map-point descriptor = bitwise MAJORITY over observed
descriptors — the summed-Hamming minimizer, the TPU-native form of the
reference's min-median-Hamming medoid (`MapPoint::
ComputeDistinctiveDescriptors`, `src/MapPoint.cc:249`). Round-1 kept the
LATEST observation's descriptor, which drifts with viewpoint."""
import numpy as np
import jax.numpy as jnp

from plslam_tpu.geometry import camera as cam_mod
from plslam_tpu.mapstate import state as mstate
from plslam_tpu.models import mapping
from plslam_tpu.ops.extract import PointFeatures


def _feats(desc_row, N=8):
    desc = np.zeros((N, 256), np.uint8)
    desc[0] = desc_row
    return PointFeatures(
        uv=jnp.zeros((N, 2)), uv_un=jnp.zeros((N, 2)),
        response=jnp.ones((N,)), octave=jnp.zeros((N,), jnp.int32),
        angle=jnp.zeros((N,)), desc=jnp.asarray(desc),
        valid=jnp.asarray([True] + [False] * (N - 1)))


def test_majority_vote_descriptor():
    cam = cam_mod.Camera.create(fx=500.0, fy=500.0, cx=160, cy=120,
                                width=320, height=240)
    cfg = mstate.MapConfig(max_kf=8, max_pt=32, max_ln=4, n_kp=8, n_lf=4,
                           n_levels=2)
    ms = mstate.allocate(cfg)
    # one pre-existing valid map point that keypoint 0 tracks
    ms = ms._replace(
        pt_xyz=ms.pt_xyz.at[0].set(jnp.asarray([0.0, 0.0, 5.0])),
        pt_valid=ms.pt_valid.at[0].set(True), n_pt=jnp.int32(1))
    sf = jnp.asarray([1.0, 1.2])

    rng = np.random.default_rng(0)
    base = (rng.random(256) < 0.5).astype(np.uint8)
    flip_a = base.copy()
    flip_a[:16] ^= 1          # observation A: 16 bits differ
    flip_b = base.copy()
    flip_b[240:] ^= 1         # observation B: a different 16 bits differ

    matched = jnp.asarray([0] + [-1] * 7, jnp.int32)
    T = jnp.eye(4)
    # three observations: base, A, B — majority of every bit equals `base`
    for i, d in enumerate((base, flip_a, flip_b)):
        ms = mapping.insert_keyframe(cam, ms, _feats(d), T, matched,
                                     jnp.int32(i), sf, desc_majority=True)

    rep = np.asarray(ms.pt_desc[0])
    np.testing.assert_array_equal(rep, base)
    assert int(ms.pt_desc_cnt[0]) == 3
    # the round-1 'latest wins' policy would have kept flip_b
    assert np.any(rep != flip_b)
