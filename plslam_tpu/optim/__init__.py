from . import residuals, pose_opt  # noqa: F401
