"""Exceptions (reference ``pyproj/exceptions.py``)."""


class ProjError(RuntimeError):
    """Raised by transform errors when errcheck=True."""


class CRSError(ProjError):
    """Raised on un-interpretable CRS input."""


class GeodError(RuntimeError):
    """Raised by geodesic computations."""
