"""Data-directory resolution — reference ``pyproj/datadir.py:53-118``.

The reference searches wheel-dir -> PROJ_DATA env -> installed PROJ ->
conda -> internal; this engine's resources are grid fixtures and
catalog extras, resolved: explicit ``set_data_dir`` -> the
``PYPROJ_SPARK_DATA`` environment variable -> a ``data/`` directory
next to the package. ``DataDirError`` is raised when none resolves,
matching the reference's error contract.
"""

from __future__ import annotations

import os

from pyproj_spark.exceptions import DataDirError

_USER_SET_DIR: str | None = None


def set_data_dir(proj_data_dir: str) -> None:
    """Override the data directory — reference datadir.py:22-38."""
    global _USER_SET_DIR
    _USER_SET_DIR = str(proj_data_dir)


def get_data_dir() -> str:
    """Resolved data directory, first match wins — reference
    datadir.py:53-118. Raises DataDirError when nothing resolves."""
    candidates = []
    if _USER_SET_DIR is not None:
        candidates.append(_USER_SET_DIR)
    env = os.environ.get("PYPROJ_SPARK_DATA")
    if env:
        candidates.append(env)
    candidates.append(os.path.join(os.path.dirname(__file__), "data"))
    for c in candidates:
        if os.path.isdir(c):
            return c
    raise DataDirError(
        "Valid data directory not found. Either set the path with "
        "set_data_dir or the PYPROJ_SPARK_DATA environment variable "
        f"(searched: {candidates})")


def get_user_data_dir(create: bool = False) -> str:
    """Per-user writable data directory — reference
    pyproj/datadir.py get_user_data_dir (appdirs semantics)."""
    base = os.environ.get("XDG_DATA_HOME",
                          os.path.join(os.path.expanduser("~"),
                                       ".local", "share"))
    d = os.path.join(base, "pyproj_spark")
    if create:
        os.makedirs(d, exist_ok=True)
    return d
