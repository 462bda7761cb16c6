from . import tracking, mapping, system  # noqa: F401
