from .state import MapState, MapConfig  # noqa: F401
