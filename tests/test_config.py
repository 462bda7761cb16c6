"""Reference YAML schema loading (`cv::FileStorage` style with the %YAML
directive, keys from `src/Tracking.cc:53-170`)."""
import numpy as np

from plslam_tpu.models.system import SLAMConfig


def test_from_yaml_reference_schema():
    cfg = SLAMConfig.from_yaml("examples/TUM1.yaml")
    assert abs(cfg.fx - 517.306408) < 1e-6
    assert abs(cfg.k2 + 0.953104) < 1e-6
    assert cfg.width == 640 and cfg.height == 480
    assert cfg.n_levels == 8
    assert abs(cfg.scale_factor - 1.2) < 1e-9
    # 1000 rounds up to the next multiple of 256 for static shapes
    assert cfg.n_features == 1024
    assert cfg.th_fast_high == 20 and cfg.th_fast_low == 7
