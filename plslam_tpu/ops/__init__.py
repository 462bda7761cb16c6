from . import pyramid, fast, orb, select, hamming  # noqa: F401
