"""Network toggle + grid download — reference ``pyproj/network.py``,
``pyproj/_network.pyx:12-48``, ``pyproj/sync.py:159-191``.

The sandbox has no route to the real PROJ CDN, so the download path is
driven against a localhost ``http.server`` — the same urllib mechanics,
sha256 gate, and atomic-rename contract.
"""

from __future__ import annotations

import hashlib
import io
import threading

import numpy as np
import pytest

import pyproj_spark.network as net
from pyproj_spark.sync import _download_resource_file, _sha256sum


@pytest.fixture(autouse=True)
def _reset_network_state(monkeypatch):
    monkeypatch.delenv("PROJ_NETWORK", raising=False)
    monkeypatch.setattr(net, "_NETWORK_ENABLED", None)
    monkeypatch.setattr(net, "_CA_BUNDLE_PATH", "")


@pytest.fixture(scope="module")
def http_root(tmp_path_factory):
    """Serve a temp dir on a localhost ephemeral port."""
    import functools
    from http.server import HTTPServer, SimpleHTTPRequestHandler

    root = tmp_path_factory.mktemp("cdn")
    handler = functools.partial(SimpleHTTPRequestHandler,
                                directory=str(root))
    srv = HTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield root, f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_toggle_env_and_explicit(monkeypatch):
    # default: PROJ_NETWORK unset -> OFF (reference _network.pyx:29-33)
    assert net.is_network_enabled() is False
    monkeypatch.setenv("PROJ_NETWORK", "ON")
    assert net.is_network_enabled() is True
    # explicit False wins over the env var
    net.set_network_enabled(False)
    assert net.is_network_enabled() is False
    # None re-reads the env var
    net.set_network_enabled(None)
    assert net.is_network_enabled() is True
    monkeypatch.setenv("PROJ_NETWORK", "OFF")
    net.set_network_enabled(None)
    assert net.is_network_enabled() is False
    net.set_network_enabled(True)
    assert net.is_network_enabled() is True
    # transformer metadata reflects the toggle (transformer.py:476-482)
    from pyproj_spark.transformer_compat import Transformer
    t = Transformer.from_crs(4326, 3857, always_xy=True)
    assert t.is_network_enabled is True
    net.set_network_enabled(False)
    assert t.is_network_enabled is False


def test_ca_bundle_path(monkeypatch, tmp_path):
    p = tmp_path / "bundle.pem"
    net.set_ca_bundle_path(p)
    assert net.get_ca_bundle_path() == str(p)
    net.set_ca_bundle_path(False)
    assert net.get_ca_bundle_path() == ""
    # env var present + None -> defer to system settings
    monkeypatch.setenv("SSL_CERT_FILE", "/tmp/x.pem")
    net.set_ca_bundle_path(None)
    assert net.get_ca_bundle_path() == ""


def test_download_requires_network(tmp_path):
    with pytest.raises(OSError, match="network is disabled"):
        _download_resource_file("http://127.0.0.1:1/x.npz", "x.npz",
                                directory=tmp_path)


def test_download_sha256_and_atomic_rename(http_root, tmp_path):
    root, base = http_root
    payload = b"grid-bytes-" * 1000
    (root / "toy.npz").write_bytes(payload)
    good = hashlib.sha256(payload).hexdigest()

    net.set_network_enabled(True)
    _download_resource_file(f"{base}/toy.npz", "toy.npz",
                            directory=tmp_path, sha256=good)
    assert (tmp_path / "toy.npz").read_bytes() == payload
    assert not (tmp_path / "toy.npz.part").exists()
    assert _sha256sum(tmp_path / "toy.npz") == good

    # corrupted checksum: raises, leaves no partial file behind
    with pytest.raises(RuntimeError, match="SHA256 mismatch"):
        _download_resource_file(f"{base}/toy.npz", "bad.npz",
                                directory=tmp_path, sha256="0" * 64)
    assert not (tmp_path / "bad.npz").exists()
    assert not (tmp_path / "bad.npz.part").exists()


def test_download_register_transform_end_to_end(http_root, tmp_path,
                                                monkeypatch):
    """The full reference workflow: fetch a grid file, register it,
    and see the datum shift applied by a Transformer."""
    from pyproj_spark.kernels import grids as G

    root, base = http_root
    # publish a small constant-shift grid: +1.0 arcsec east / +0.5 north
    ny, nx = 5, 7
    buf = io.BytesIO()
    np.savez(buf, west=-10.0, south=40.0, east=10.0, north=50.0,
             dlon_sec=np.full((ny, nx), 1.0),
             dlat_sec=np.full((ny, nx), 0.5))
    (root / "eu_toy.npz").write_bytes(buf.getvalue())

    net.set_network_enabled(True)
    _download_resource_file(f"{base}/eu_toy.npz", "eu_toy.npz",
                            directory=tmp_path)

    monkeypatch.setattr(G, "_GRIDS", dict(G._GRIDS))
    monkeypatch.setattr(G, "GRID_REGISTRY", dict(G.GRID_REGISTRY))
    g = G.register_grid_file(tmp_path / "eu_toy.npz", "TOY27", "TOY83")
    assert g.nx == nx and g.ny == ny and g.name == "eu_toy.npz"
    lon, lat = g.apply(np.array([0.0]), np.array([45.0]))
    np.testing.assert_allclose(lon, [1.0 / 3600], rtol=1e-12)
    np.testing.assert_allclose(lat, [45.0 + 0.5 / 3600], rtol=1e-12)
    # inventory now sees the grid as downloaded
    from pyproj_spark.sync import get_transform_grid_list
    feats = get_transform_grid_list(include_already_downloaded=True)
    assert not any(f["properties"]["name"] == "eu_toy.npz" for f in feats)


def test_load_grid_file_malformed(tmp_path):
    from pyproj_spark.kernels.grids import load_grid_file
    bad = tmp_path / "bad.npz"
    np.savez(bad, west=0.0, south=0.0, east=1.0, north=1.0,
             dlon_sec=np.zeros((3, 4)), dlat_sec=np.zeros((4, 3)))
    with pytest.raises(ValueError, match="malformed"):
        load_grid_file(bad)


def test_cli_sync_all(http_root, tmp_path, monkeypatch):
    from pyproj_spark.__main__ import main

    # disabled -> guidance + exit 1 (previous stub behavior, kept)
    assert main(["sync", "--all"]) == 1

    # enabled -> each matching feature is fetched
    calls = []
    import pyproj_spark.sync as sync_mod
    monkeypatch.setattr(
        sync_mod, "_download_resource_file",
        lambda file_url, short_name, directory=None, verbose=False,
        sha256=None: calls.append((file_url, short_name, directory)))
    net.set_network_enabled(True)
    rc = main(["sync", "--all", "--source-id", "us_noaa",
               "--directory", str(tmp_path)])
    assert rc == 0
    assert {c[1] for c in calls} == {"us_noaa_conshpgn.tif",
                                     "us_noaa_alhpgn.tif"}
    assert all(c[2] == str(tmp_path) for c in calls)
