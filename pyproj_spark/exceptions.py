"""Exceptions (reference ``pyproj/exceptions.py``)."""


class ProjError(RuntimeError):
    """Raised by transform errors when errcheck=True."""


class CRSError(ProjError, ValueError):
    """Raised on un-interpretable CRS input (reference
    pyproj/exceptions.py CRSError(ProjError); also a ValueError here so
    pre-existing ValueError handlers keep working)."""


class GeodError(RuntimeError, ValueError):
    """Raised by geodesic computations (reference GeodError)."""


class DataDirError(RuntimeError):
    """Raised when a data directory cannot be resolved — reference
    pyproj/exceptions.py:27 (in this engine: grid/resource paths
    passed to register_grid or the sync CLI)."""
