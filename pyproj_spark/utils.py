"""Container-preserving conversion utilities — the behavior of
reference ``pyproj/utils.py`` (``_copytobuffer`` / ``_convertback`` /
``DataType``, utils.py:55-152), re-expressed over numpy instead of the
Python Buffer API: the engine's kernels are vectorized numpy, so the
"buffer" here is a float64 ndarray, but the CONTRACT is identical —
scalar in -> scalar out, list -> list, tuple -> tuple, array-likes
(numpy / pandas.Series / anything with ``__array__``) -> ndarray, and
0-d numpy arrays count as scalars. ``is_null`` / ``strtobool`` /
``NumpyEncoder`` match reference utils.py:10-52."""

from __future__ import annotations

import json
from array import array
from enum import Enum, auto
from typing import Any

import numpy as np


def is_null(value: Any) -> bool:
    """True for NaN or None (reference utils.py:11-16)."""
    return value != value or value is None


def strtobool(value: Any) -> bool:
    """distutils-compatible truth parsing (reference utils.py:19-32)."""
    value = str(value).lower()
    if value in ("y", "yes", "t", "true", "on", "1"):
        return True
    if value in ("n", "no", "f", "false", "off", "0"):
        return False
    raise ValueError(f"invalid truth value: '{value}'")


class NumpyEncoder(json.JSONEncoder):
    """JSON encoder tolerant of numpy scalars/arrays (utils.py:35-52)."""

    def default(self, obj):
        try:
            return obj.tolist()
        except AttributeError:
            pass
        try:
            if obj.dtype.kind == "f":
                return float(obj)
            if obj.dtype.kind == "i":
                return int(obj)
        except AttributeError:
            pass
        return json.JSONEncoder.default(self, obj)


class DataType(Enum):
    """Input-container tag for convertback (utils.py:55-63)."""

    FLOAT = auto()
    LIST = auto()
    TUPLE = auto()
    ARRAY = auto()
    STDLIB_ARRAY = auto()


def _copytobuffer_return_scalar(xxx: Any) -> tuple[np.ndarray, DataType]:
    """Scalar (or 0-d array) -> 1-element float64 ndarray."""
    try:
        return np.array([float(xxx)], dtype=np.float64), DataType.FLOAT
    except Exception:
        raise TypeError("input must be a scalar") from None


def _copytobuffer(xxx: Any) -> tuple[np.ndarray, DataType]:
    """Any supported container -> (float64 ndarray copy, DataType).

    Mirrors reference utils.py:89-143: masked arrays keep their mask,
    __array__-capable objects (pandas.Series, xarray.DataArray)
    convert through it, 0-d arrays are scalars, lists/tuples remember
    their type for the round trip.
    """
    if isinstance(xxx, np.ma.MaskedArray):
        return xxx.astype("d", order="C"), DataType.ARRAY
    if (not hasattr(xxx, "hardmask") and hasattr(xxx, "__array__")
            and callable(xxx.__array__)):
        xxx = xxx.__array__()
    if hasattr(xxx, "shape"):
        if xxx.shape == ():
            return _copytobuffer_return_scalar(xxx)
        return xxx.astype("d", order="C", copy=True), DataType.ARRAY
    if isinstance(xxx, array):
        # Forced copy: reference _copytobuffer always copies (unless
        # inplace), so the result must never alias the caller's buffer
        # (reference utils.py:131-133).
        return np.array(xxx, dtype=np.float64), DataType.STDLIB_ARRAY
    if isinstance(xxx, list):
        return np.asarray(xxx, dtype=np.float64), DataType.LIST
    if isinstance(xxx, tuple):
        return np.asarray(xxx, dtype=np.float64), DataType.TUPLE
    return _copytobuffer_return_scalar(xxx)


def _convertback(data_type: DataType, inx: np.ndarray) -> Any:
    """Restore the caller's container (reference utils.py:146-152)."""
    if data_type == DataType.FLOAT:
        return float(inx[0])
    if data_type == DataType.LIST:
        return inx.tolist()
    if data_type == DataType.TUPLE:
        return tuple(inx)
    if data_type == DataType.STDLIB_ARRAY:
        return array("d", inx)
    return inx
