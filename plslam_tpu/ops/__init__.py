from . import pyramid, fast, orb, select, hamming, lines  # noqa: F401
