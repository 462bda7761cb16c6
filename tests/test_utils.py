"""Coverage for the runtime utilities: native C++ prefetch loader,
map checkpointing, headless visualization, trajectory export formats."""
import os
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest


class TestNativeLoader:
    def test_png_jpeg_roundtrip_and_prefetch(self):
        cv2 = pytest.importorskip("cv2")
        from plslam_tpu.utils import native_loader
        rng = np.random.default_rng(0)
        with tempfile.TemporaryDirectory() as d:
            paths, refs = [], []
            for i in range(6):
                img = rng.integers(0, 256, (60, 80), np.uint8)
                p = os.path.join(d, f"f{i}.png" if i % 2 == 0 else f"f{i}.jpg")
                cv2.imwrite(p, img)
                paths.append(p)
                refs.append(img)
            ld = native_loader.PrefetchLoader(paths, queue_depth=3, n_threads=2)
            outs = list(ld)
            assert len(outs) == 6
            for p, ref, got in zip(paths, refs, outs):
                if p.endswith(".png"):
                    np.testing.assert_array_equal(got, ref)
                else:  # jpeg is lossy
                    assert np.abs(got.astype(int) - ref.astype(int)).mean() < 8

    def test_decode_gray_single(self):
        cv2 = pytest.importorskip("cv2")
        from plslam_tpu.utils import native_loader
        with tempfile.TemporaryDirectory() as d:
            img = np.arange(64 * 48, dtype=np.uint8).reshape(48, 64) % 251
            p = os.path.join(d, "x.png")
            cv2.imwrite(p, img)
            out = native_loader.decode_gray(p)
            np.testing.assert_array_equal(out, img)


class TestCheckpoint:
    def test_map_roundtrip(self):
        from plslam_tpu.mapstate import state as mstate, checkpoint
        cfg = mstate.MapConfig(max_kf=4, max_pt=64, max_ln=8, n_kp=32, n_lf=4)
        ms = mstate.allocate(cfg)
        ms = ms._replace(pt_xyz=ms.pt_xyz.at[3].set(jnp.asarray([1.0, 2.0, 3.0])),
                         pt_valid=ms.pt_valid.at[3].set(True),
                         n_pt=jnp.int32(4))
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "map.npz")
            checkpoint.save_map(ms, p)
            ms2 = checkpoint.load_map(p)
        for f in ms._fields:
            np.testing.assert_array_equal(np.asarray(getattr(ms, f)),
                                          np.asarray(getattr(ms2, f)), err_msg=f)

    def test_point_cloud_ply(self):
        from plslam_tpu.mapstate import state as mstate, checkpoint
        cfg = mstate.MapConfig(max_kf=2, max_pt=8, max_ln=2, n_kp=8, n_lf=2)
        ms = mstate.allocate(cfg)
        ms = ms._replace(pt_xyz=ms.pt_xyz.at[0].set(jnp.asarray([1.0, 2.0, 3.0])),
                         pt_valid=ms.pt_valid.at[0].set(True))
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "map.ply")
            checkpoint.save_point_cloud(ms, p)
            text = open(p).read()
        assert "element vertex 1" in text
        assert "1.000000 2.000000 3.000000" in text


class TestViz:
    def test_draw_frame_and_map(self):
        pytest.importorskip("cv2")
        from plslam_tpu.utils import viz
        from plslam_tpu.ops.extract import PointFeatures
        from plslam_tpu.mapstate import state as mstate
        img = np.full((48, 64), 100, np.float32)
        n = 5
        feats = PointFeatures(
            uv=jnp.asarray(np.random.default_rng(0).uniform(5, 40, (n, 2)).astype(np.float32)),
            uv_un=jnp.zeros((n, 2)), response=jnp.ones(n),
            octave=jnp.zeros(n, jnp.int32), angle=jnp.zeros(n),
            desc=jnp.zeros((n, 256), jnp.uint8), valid=jnp.ones(n, bool))
        vis = viz.draw_frame(img, feats, matched=np.asarray([1, 0, 1, 0, 1], bool))
        assert vis.shape == (48, 64, 3) and vis.dtype == np.uint8

        cfg = mstate.MapConfig(max_kf=2, max_pt=16, max_ln=2, n_kp=8, n_lf=2)
        ms = mstate.allocate(cfg)
        ms = ms._replace(pt_xyz=jnp.asarray(
            np.random.default_rng(1).normal(size=(16, 3)).astype(np.float32)),
            pt_valid=jnp.ones(16, bool))
        top = viz.draw_map_topdown(ms, size=128)
        assert top.shape == (128, 128, 3)
