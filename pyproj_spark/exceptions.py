"""Exceptions (reference ``pyproj/exceptions.py``)."""


class ProjError(RuntimeError):
    """Raised by transform errors when errcheck=True."""


class CRSError(ProjError, ValueError):
    """Raised on un-interpretable CRS input (reference
    pyproj/exceptions.py CRSError(ProjError); also a ValueError here so
    pre-existing ValueError handlers keep working)."""


class GeodError(RuntimeError, ValueError):
    """Raised by geodesic computations (reference GeodError)."""
