"""PROJ-network settings — reference ``pyproj/network.py:1-60`` and
``pyproj/_network.pyx:12-48``.

The reference flips a flag on the PROJ C context (``proj_context_set_
enable_network``); grids are then fetched lazily from the CDN during
transforms.  This engine keeps the same three-state API (True / False /
None = defer to ``PROJ_NETWORK``) in a module-level flag that
:meth:`TransformSpec.is_network_enabled` and
:func:`pyproj_spark.sync._download_resource_file` consult.  Actual
fetching lives in ``sync.py`` and works against any URL ``urllib``
can open (http(s), file) — exercised in tests with a localhost server,
since this sandbox has no route to the real CDN.
"""

from __future__ import annotations

import os
from pathlib import Path

_NETWORK_ENABLED: bool | None = None  # None -> consult PROJ_NETWORK


def _strtobool(value: str) -> bool:
    """Reference ``pyproj/utils.py`` strtobool: ON/TRUE/YES/1 (any case)."""
    return value.strip().lower() in ("on", "true", "yes", "y", "t", "1")


def set_network_enabled(active: bool | None = None) -> None:
    """Set whether grid-fetch networking is enabled by default — same
    contract as reference ``_network.pyx:12-34`` / the ``PROJ_NETWORK``
    environment variable.

    Parameters
    ----------
    active: bool, optional
        ``None`` (default) re-reads ``PROJ_NETWORK`` from the
        environment (OFF when unset).  ``True``/``False`` force the
        setting regardless of the environment.
    """
    global _NETWORK_ENABLED
    if active is None:
        _NETWORK_ENABLED = _strtobool(os.environ.get("PROJ_NETWORK", "OFF"))
    else:
        _NETWORK_ENABLED = bool(active)


def is_network_enabled() -> bool:
    """Whether grid-fetch networking is enabled — reference
    ``_network.pyx:37-48``."""
    if _NETWORK_ENABLED is None:
        return _strtobool(os.environ.get("PROJ_NETWORK", "OFF"))
    return _NETWORK_ENABLED


_CA_BUNDLE_PATH: str = ""


def set_ca_bundle_path(ca_bundle_path: Path | str | bool | None = None
                       ) -> None:
    """Set the CA bundle used for https grid fetches — reference
    ``network.py:17-59``.  ``certifi`` is optional here (import-gated);
    the resolution order mirrors the reference: explicit path > True /
    no env vars -> certifi > False/'' -> system settings.
    """
    global _CA_BUNDLE_PATH
    env_var_names = ("PROJ_CURL_CA_BUNDLE", "CURL_CA_BUNDLE",
                     "SSL_CERT_FILE")

    def _certifi_where() -> str:
        try:
            import certifi
            return certifi.where()
        except ImportError:
            return ""

    if ca_bundle_path is False:
        resolved = ""
    elif isinstance(ca_bundle_path, (str, Path)):
        resolved = str(ca_bundle_path)
    elif (ca_bundle_path is True) or not any(
            name in os.environ for name in env_var_names):
        resolved = _certifi_where()
    else:
        resolved = ""
    _CA_BUNDLE_PATH = resolved


def get_ca_bundle_path() -> str:
    """Currently-set CA bundle path ('' = system default)."""
    return _CA_BUNDLE_PATH
