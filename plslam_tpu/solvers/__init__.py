from . import twoview  # noqa: F401
