from . import metrics, viz  # noqa: F401
