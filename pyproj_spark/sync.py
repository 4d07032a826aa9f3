"""Grid inventory queries (reference ``pyproj/sync.py:214-280``
``get_transform_grid_list``).

The reference filters PROJ's CDN ``files.geojson``; this sandbox has no
route to the CDN, so the inventory is a BUNDLED static feature list
(entries are public PROJ-data registry facts, plus the engine's own
registered grids). The filter semantics — bbox intersects/contains with
antimeridian normalization, world-coverage exclusion, property filters,
downloaded-already filter — mirror the reference.
``_download_resource_file`` is a real downloader (stream + sha256 +
atomic rename, reference sync.py:172-191) gated on the
``pyproj_spark.network`` toggle; tests drive it via localhost HTTP.
"""

from __future__ import annotations

from pyproj_spark.aoi import BBox

#: bundled inventory: (name, source_id, area_of_use, west, south, east,
#: north). Grid metadata is from the public proj-data registry; the
#: us_synth entry is this engine's registered synthetic NAD27<->NAD83
#: stand-in (kernels/grids.py).
_GRID_FEATURES = [
    ("us_synth_conus.tif", "us_synth", "USA - CONUS (synthetic stand-in)",
     -125.0, 24.0, -66.0, 50.0),
    ("us_noaa_conshpgn.tif", "us_noaa", "USA - CONUS - onshore",
     -124.79, 24.41, -66.91, 49.38),
    ("us_noaa_alhpgn.tif", "us_noaa", "USA - Alaska",
     -194.0, 51.0, -127.0, 73.0),
    ("ca_nrc_ntv2_0.tif", "ca_nrc", "Canada",
     -142.0, 40.0, -47.0, 84.0),
    ("au_icsm_GDA94_GDA2020_conformal.tif", "au_icsm", "Australia - GDA",
     93.41, -60.55, 173.34, -8.47),
    ("de_adv_BETA2007.tif", "de_adv", "Germany - onshore",
     5.86, 47.27, 15.04, 55.09),
    ("uk_os_OSTN15_NTv2_OSGBtoETRS.tif", "uk_os", "UK - Britain and UKCS",
     -9.0, 49.75, 2.01, 61.01),
    ("us_nga_egm96_15.tif", "us_nga", "World",
     -180.0, -90.0, 180.0, 90.0),
]


def _feature(name, source_id, area, w, s, e, n) -> dict:
    return {
        "type": "Feature",
        "properties": {"name": name, "source_id": source_id,
                       "area_of_use": area,
                       "url": f"https://cdn.proj.org/{name}"},
        "geometry": {"type": "Polygon",
                     "coordinates": [[[w, s], [e, s], [e, n], [w, n],
                                      [w, s]]]},
    }


def _bounds(feature: dict):
    ring = feature["geometry"]["coordinates"][0]
    xs = [p[0] for p in ring]
    ys = [p[1] for p in ring]
    return min(xs), min(ys), max(xs), max(ys)


def _filter_bbox(feature, bbox: BBox, spatial_test: str,
                 include_world_coverage: bool) -> bool:
    w, s, e, n = _bounds(feature)
    if not include_world_coverage and (e - w) >= 359.0 and (n - s) >= 179.0:
        return False
    if spatial_test == "contains":
        # the query bbox must contain the grid extent? No — reference:
        # the GRID extent must contain the query bbox
        return (w <= bbox.west and s <= bbox.south
                and e >= bbox.east and n >= bbox.north)
    return not (e < bbox.west or w > bbox.east
                or n < bbox.south or s > bbox.north)


def get_transform_grid_list(source_id: str | None = None,
                            area_of_use: str | None = None,
                            filename: str | None = None,
                            bbox: BBox | None = None,
                            spatial_test: str = "intersects",
                            include_world_coverage: bool = True,
                            include_already_downloaded: bool = False,
                            target_directory=None) -> tuple:
    """List downloadable transform grids — reference sync.py:214-280.
    Returns geojson-shaped feature dicts."""
    if spatial_test not in ("intersects", "contains"):
        raise ValueError("spatial_test must be 'intersects' or 'contains'")
    from pyproj_spark.kernels.grids import _GRIDS
    feats = [_feature(*row) for row in _GRID_FEATURES]
    if bbox is not None:
        west, east = bbox.west, bbox.east
        if west > 180 and east > west:
            west, east = west - 360, east - 360
        elif west < -180 and east > west:
            west, east = west + 360, east + 360
        elif abs(west) < 180 and abs(east) < 180 and east < west:
            east += 360
        nb = BBox(west=west, south=bbox.south, east=east, north=bbox.north)
        feats = [f for f in feats
                 if _filter_bbox(f, nb, spatial_test,
                                 include_world_coverage)]
    if source_id is not None:
        feats = [f for f in feats
                 if f["properties"]["source_id"] == source_id]
    if area_of_use is not None:
        feats = [f for f in feats
                 if area_of_use in f["properties"]["area_of_use"]]
    if filename is not None:
        feats = [f for f in feats
                 if filename in f["properties"]["name"]]
    if not include_already_downloaded:
        # "downloaded" = registered and usable in this engine's kernel
        feats = [f for f in feats
                 if f["properties"]["name"] not in _GRIDS]
    return tuple(feats)


def _sha256sum(input_file) -> str:
    """Streaming sha256 of a file — reference sync.py:159-169."""
    import hashlib
    hasher = hashlib.sha256()
    with open(input_file, "rb") as fh:
        for chunk in iter(lambda: fh.read(65536), b""):
            hasher.update(chunk)
    return hasher.hexdigest()


def _download_resource_file(file_url, short_name, directory=None,
                            verbose=False, sha256=None):
    """Download a resource file — reference sync.py:172-191: stream to
    ``<short_name>.part``, verify sha256 when given, atomic rename into
    place, always clean up the partial file.

    Networking must be enabled (:func:`pyproj_spark.network.
    set_network_enabled`); the sandbox has no route to the real PROJ
    CDN, so tests exercise this against a localhost HTTP server and
    ``file://`` URLs — any ``urllib``-openable scheme works.
    """
    import os
    from pathlib import Path
    from urllib.request import urlretrieve

    from pyproj_spark.network import is_network_enabled

    if not is_network_enabled():
        raise OSError(
            "PROJ network is disabled; call "
            "pyproj_spark.network.set_network_enabled(True) or set "
            "PROJ_NETWORK=ON (offline alternative: "
            "kernels.grids.register_grid with local arrays)")
    if directory is None:
        from pyproj_spark.datadir import get_user_data_dir
        directory = get_user_data_dir(create=True)
    if verbose:
        print(f"Downloading: {file_url}")
    tmp_path = Path(directory, f"{short_name}.part")
    try:
        urlretrieve(file_url, tmp_path)
        if sha256 is not None and sha256 != _sha256sum(tmp_path):
            raise RuntimeError(f"SHA256 mismatch: {short_name}")
        tmp_path.replace(Path(directory, short_name))
    finally:
        try:
            os.remove(tmp_path)
        except FileNotFoundError:
            pass
