"""Bundled EPSG-subset parameter catalog.

Replaces PROJ's proj.db (reference ``pyproj/_context.pyx:138``) with a
small static table of the codes the engine supports. All parameter
values are public EPSG registry facts (also printed by ``projinfo``).

Each entry: kind, name, datum (name, ellps, towgs84 -> WGS84),
projection params (PROJ-style), axis order, unit.

Axis order strings: "enu" (x/east first — projected and lon/lat),
"neu" (lat/lon or northing/easting first — EPSG geographic authority
order). ``always_xy=True`` on the Transformer forces "enu" at both ends
(reference ``pyproj/_transformer.pyx:736-750`` normalization).
"""

from __future__ import annotations

US_FT = 0.30480060960121924  # US survey foot, EPSG:9003

#: prime meridian name -> Greenwich offset in decimal degrees (public
#: PROJ table; the DMS strings are in catalog_api.get_prime_meridians_map)
PRIME_MERIDIANS = {
    "greenwich": 0.0,
    "lisbon": -9.131906111111112,
    "paris": 2.337229166666667,
    "bogota": -74.08091666666667,
    "madrid": -3.687938888888889,
    "rome": 12.452333333333334,
    "bern": 7.439583333333333,
    "jakarta": 106.80771944444444,
    "ferro": -17.666666666666668,
    "brussels": 4.367975,
    "stockholm": 18.05827777777778,
    "athens": 23.7163375,
    "oslo": 10.722916666666666,
}

# datum name -> (ellps, towgs84 tuple or None)
DATUMS = {
    "WGS84": ("WGS84", (0, 0, 0)),
    "ETRS89": ("GRS80", (0, 0, 0)),
    "NAD83": ("GRS80", (0, 0, 0)),
    "GGRS87": ("GRS80", (-199.87, 74.79, 246.62)),
    "ED50": ("intl", (-87, -98, -121)),
    "NAD27": ("clrk66", (-8, 160, 176)),
    "OSGB36": ("airy", (446.448, -125.157, 542.060,
                        0.1502, 0.2470, 0.8421, -20.4894)),
    "potsdam": ("bessel", (598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7)),
    "monte_mario": ("intl", (-104.1, -49.1, -9.9, 0.971, -2.917, 0.714,
                             -11.68)),
    "ITRF2014": ("GRS80", (0, 0, 0)),
    "SIRGAS2000": ("GRS80", (0, 0, 0)),
    "NTF": ("clrk80ign", (-168, -60, 320)),
    "RGF93": ("GRS80", (0, 0, 0)),
    "GDA94": ("GRS80", (0, 0, 0)),
    "GDA2020": ("GRS80", (0, 0, 0)),
    "SWEREF99": ("GRS80", (0, 0, 0)),
    "NZGD2000": ("GRS80", (0, 0, 0)),
    "GDM2000": ("GRS80", (0, 0, 0)),
    "NAD83_CSRS": ("GRS80", (0, 0, 0)),
    # EPSG:1237 "WGS 72 to WGS 84 (1)": dz=4.5 m, rz=0.554", ds=0.2263 ppm
    "WGS72": ("WGS72", (0, 0, 4.5, 0, 0, 0.554, 0.2263)),
}

#: deprecated EPSG codes -> their non-deprecated successors (reference
#: proj.db deprecation table; CRS.is_deprecated / get_non_deprecated)
DEPRECATED = {
    4140: [4617],  # NAD83(CSRS98) -> NAD83(CSRS)
}

_GEOG = {
    # 4-tuple entries carry a non-Greenwich prime meridian name
    4807: ("NTF (Paris) / geographic 2D", "NTF", "neu", "paris"),
    4326: ("WGS84 / geographic 2D", "WGS84", "neu"),
    4979: ("WGS84 / geographic 3D", "WGS84", "neu"),
    4937: ("ETRS89 / geographic 3D", "ETRS89", "neu"),
    4258: ("ETRS89 / geographic 2D", "ETRS89", "neu"),
    4269: ("NAD83 / geographic 2D", "NAD83", "neu"),
    4267: ("NAD27 / geographic 2D", "NAD27", "neu"),
    4140: ("NAD83(CSRS98) / geographic 2D", "NAD83_CSRS", "neu"),
    4617: ("NAD83(CSRS) / geographic 2D", "NAD83_CSRS", "neu"),
    4121: ("GGRS87 / geographic 2D", "GGRS87", "neu"),
    4230: ("ED50 / geographic 2D", "ED50", "neu"),
    4277: ("OSGB36 / geographic 2D", "OSGB36", "neu"),
    4171: ("RGF93 v1 / geographic 2D", "RGF93", "neu"),
    4283: ("GDA94 / geographic 2D", "GDA94", "neu"),
    7844: ("GDA2020 / geographic 2D", "GDA2020", "neu"),
    4619: ("SWEREF99 / geographic 2D", "SWEREF99", "neu"),
}

#: geographic codes whose ellipsoidal CS is 3D (with ellipsoidal
#: height) — EPSG models these as distinct CRSs from their 2D twins
_GEOG_3D_CODES = frozenset({4979, 4937})

_GEOCENT = {
    4978: ("WGS84 / geocentric", "WGS84"),
}

_PROJECTED = {
    3857: ("WGS 84 / Pseudo-Mercator", "WGS84",
           dict(proj="webmerc"), "enu", 1.0),
    2100: ("GGRS87 / Greek Grid", "GGRS87",
           dict(proj="tmerc", lat_0=0, lon_0=24, k_0=0.9996, x_0=500000,
                y_0=0), "enu", 1.0),
    2263: ("NAD83 / New York Long Island (ftUS)", "NAD83",
           dict(proj="lcc", lat_1=41.03333333333333, lat_2=40.66666666666666,
                lat_0=40.16666666666666, lon_0=-74,
                x_0=300000.0000000001, y_0=0.0), "enu", US_FT),
    26915: ("NAD83 / UTM zone 15N", "NAD83",
            dict(proj="utm", zone=15), "enu", 1.0),
    # note: authority axis order of 2193 is (northing, easting) -> "neu";
    # exercised by reference test/test_transformer.py:388-397
    2193: ("NZGD2000 / New Zealand Transverse Mercator 2000", "NZGD2000",
           dict(proj="tmerc", lat_0=0, lon_0=173, k_0=0.9996, x_0=1600000,
                y_0=10000000), "neu", 1.0),
    27700: ("OSGB36 / British National Grid", "OSGB36",
            dict(proj="tmerc", lat_0=49, lon_0=-2, k_0=0.9996012717,
                 x_0=400000, y_0=-100000), "enu", 1.0),
    3067: ("ETRS89 / TM35FIN(E,N)", "ETRS89",
           dict(proj="tmerc", lat_0=0, lon_0=27, k_0=0.9996, x_0=500000,
                y_0=0), "enu", 1.0),
    3035: ("ETRS89-extended / LAEA Europe", "ETRS89",
           dict(proj="laea", lat_0=52, lon_0=10, x_0=4321000, y_0=3210000),
           "neu", 1.0),
    3031: ("WGS 84 / Antarctic Polar Stereographic", "WGS84",
           dict(proj="stere", lat_0=-90, lat_ts=-71, lon_0=0, x_0=0, y_0=0),
           "enu", 1.0),
    3413: ("WGS 84 / NSIDC Sea Ice Polar Stereographic North", "WGS84",
           dict(proj="stere", lat_0=90, lat_ts=70, lon_0=-45, x_0=0, y_0=0),
           "enu", 1.0),
    3395: ("WGS 84 / World Mercator", "WGS84",
           dict(proj="merc", lon_0=0, k_0=1, x_0=0, y_0=0), "enu", 1.0),
    4087: ("WGS 84 / World Equidistant Cylindrical", "WGS84",
           dict(proj="eqc", lat_ts=0, lon_0=0, x_0=0, y_0=0), "enu", 1.0),
    5070: ("NAD83 / Conus Albers", "NAD83",
           dict(proj="aea", lat_1=29.5, lat_2=45.5, lat_0=23, lon_0=-96,
                x_0=0, y_0=0), "enu", 1.0),
    6933: ("WGS 84 / NSIDC EASE-Grid 2.0 Global", "WGS84",
           dict(proj="cea", lat_ts=30, lon_0=0, x_0=0, y_0=0), "enu", 1.0),
    5880: ("SIRGAS 2000 / Brazil Polyconic", "SIRGAS2000",
           dict(proj="poly", lat_0=0, lon_0=-54, x_0=5000000, y_0=10000000),
           "enu", 1.0),
    3376: ("GDM2000 / Peninsula RSO", "GDM2000",
           dict(proj="omerc", lat_0=4, lonc=102.25,
                alpha=323.0257964666666, gamma=323.1301023611111,
                k_0=0.99984, x_0=804671, y_0=0), "enu", 1.0),
}

_PROJECTED.update({
    2154: ("RGF93 v1 / Lambert-93", "RGF93",
           dict(proj="lcc", lat_1=49, lat_2=44, lat_0=46.5, lon_0=3,
                x_0=700000, y_0=6600000), "enu", 1.0),
    3006: ("SWEREF99 TM", "SWEREF99",
           dict(proj="tmerc", lat_0=0, lon_0=15, k_0=0.9996,
                x_0=500000, y_0=0), "neu", 1.0),
    32661: ("WGS 84 / UPS North (N,E)", "WGS84",
            dict(proj="stere", lat_0=90, k_0=0.994, lon_0=0,
                 x_0=2000000, y_0=2000000), "neu", 1.0),
    32761: ("WGS 84 / UPS South (N,E)", "WGS84",
            dict(proj="stere", lat_0=-90, k_0=0.994, lon_0=0,
                 x_0=2000000, y_0=2000000), "neu", 1.0),
    3338: ("NAD83 / Alaska Albers", "NAD83",
           dict(proj="aea", lat_1=55, lat_2=65, lat_0=50, lon_0=-154,
                x_0=0, y_0=0), "enu", 1.0),
    6931: ("WGS 84 / NSIDC EASE-Grid 2.0 North", "WGS84",
           dict(proj="laea", lat_0=90, lon_0=0, x_0=0, y_0=0),
           "enu", 1.0),
    6932: ("WGS 84 / NSIDC EASE-Grid 2.0 South", "WGS84",
           dict(proj="laea", lat_0=-90, lon_0=0, x_0=0, y_0=0),
           "enu", 1.0),
    3112: ("GDA94 / Geoscience Australia Lambert", "GDA94",
           dict(proj="lcc", lat_1=-18, lat_2=-36, lat_0=0, lon_0=134,
                x_0=0, y_0=0), "enu", 1.0),
})
# ETRS89 / UTM zones 28N-38N (EPSG 25828-25838)
for _z in range(28, 39):
    _PROJECTED[25800 + _z] = (
        f"ETRS89 / UTM zone {_z}N", "ETRS89", dict(proj="utm", zone=_z),
        "enu", 1.0)
# ED50 / UTM zones 28N-38N (EPSG 23028-23038)
for _z in range(28, 39):
    _PROJECTED[23000 + _z] = (
        f"ED50 / UTM zone {_z}N", "ED50", dict(proj="utm", zone=_z),
        "enu", 1.0)
# GDA94 / MGA zones 48-58 (EPSG 28348-28358; southern-hemisphere UTM)
for _z in range(48, 59):
    _PROJECTED[28300 + _z] = (
        f"GDA94 / MGA zone {_z}", "GDA94",
        dict(proj="utm", zone=_z, south=True), "enu", 1.0)
# GDA2020 / MGA zones 48-58 (EPSG 7848-7858)
for _z in range(48, 59):
    _PROJECTED[7800 + _z] = (
        f"GDA2020 / MGA zone {_z}", "GDA2020",
        dict(proj="utm", zone=_z, south=True), "enu", 1.0)

# NAD83 UTM zones 1-23 (EPSG 26901-26923)
for _z in range(1, 24):
    _PROJECTED[26900 + _z] = (
        f"NAD83 / UTM zone {_z}N", "NAD83", dict(proj="utm", zone=_z),
        "enu", 1.0)
# WGS72 UTM zones 1N-60N / 1S-60S (EPSG 32201-32260 / 32301-32360)
for _z in range(1, 61):
    _PROJECTED[32200 + _z] = (
        f"WGS 72 / UTM zone {_z}N", "WGS72", dict(proj="utm", zone=_z),
        "enu", 1.0)
    _PROJECTED[32300 + _z] = (
        f"WGS 72 / UTM zone {_z}S", "WGS72",
        dict(proj="utm", zone=_z, south=True), "enu", 1.0)
# NAD27 UTM zones 3N-22N (EPSG 26703-26722)
for _z in range(3, 23):
    _PROJECTED[26700 + _z] = (
        f"NAD27 / UTM zone {_z}N", "NAD27", dict(proj="utm", zone=_z),
        "enu", 1.0)

# California SPCS83 zones 1-6, US survey foot (EPSG 2225-2230):
# lcc 2SP with x_0 = 6,561,666.667 ftUS (2,000,000 m), y_0 =
# 1,640,416.667 ftUS (500,000 m) — EPSG registry parameters
_CA_X0 = 6561666.667 * US_FT
_CA_Y0 = 1640416.667 * US_FT
for _code, _zone, _l1, _l2, _l0, _lon in (
        (2225, 1, 41.66666666666666, 40.0, 39.33333333333334, -122.0),
        (2226, 2, 39.83333333333334, 38.33333333333334,
         37.66666666666666, -122.0),
        (2227, 3, 38.43333333333333, 37.06666666666667, 36.5, -120.5),
        (2228, 4, 37.25, 36.0, 35.33333333333334, -119.0),
        (2229, 5, 35.46666666666667, 34.03333333333333, 33.5, -118.0),
        (2230, 6, 33.88333333333333, 32.78333333333333,
         32.16666666666666, -116.25)):
    _PROJECTED[_code] = (
        f"NAD83 / California zone {_zone} (ftUS)", "NAD83",
        dict(proj="lcc", lat_1=_l1, lat_2=_l2, lat_0=_l0, lon_0=_lon,
             x_0=_CA_X0, y_0=_CA_Y0), "enu", US_FT)
# WGS84 UTM north 32601-32660 / south 32701-32760
for _z in range(1, 61):
    _PROJECTED[32600 + _z] = (
        f"WGS 84 / UTM zone {_z}N", "WGS84", dict(proj="utm", zone=_z),
        "enu", 1.0)
    _PROJECTED[32700 + _z] = (
        f"WGS 84 / UTM zone {_z}S", "WGS84",
        dict(proj="utm", zone=_z, south=True), "enu", 1.0)


def epsg_entry(code: int) -> dict:
    """Resolve an EPSG code to a normalized catalog record."""
    code = int(code)
    dep = code in DEPRECATED
    if code in _GEOG:
        name, datum, axis, *rest = _GEOG[code]
        ellps, towgs84 = DATUMS[datum]
        return dict(kind="geographic", code=code, name=name, datum=datum,
                    ellps=ellps, towgs84=towgs84, axis=axis,
                    proj_params=dict(proj="longlat"), to_meter=None,
                    deprecated=dep,
                    n_dim=3 if code in _GEOG_3D_CODES else 2,
                    pm=PRIME_MERIDIANS[rest[0]] if rest else 0.0)
    if code in _GEOCENT:
        name, datum = _GEOCENT[code]
        ellps, towgs84 = DATUMS[datum]
        return dict(kind="geocentric", code=code, name=name, datum=datum,
                    ellps=ellps, towgs84=towgs84, axis="enu",
                    proj_params=dict(proj="geocent"), to_meter=1.0,
                    deprecated=dep)
    if code in _PROJECTED:
        name, datum, params, axis, to_meter = _PROJECTED[code]
        ellps, towgs84 = DATUMS[datum]
        return dict(kind="projected", code=code, name=name, datum=datum,
                    ellps=ellps, towgs84=towgs84, axis=axis,
                    proj_params=dict(params), to_meter=to_meter,
                    deprecated=dep)
    from pyproj_spark.exceptions import CRSError
    raise CRSError(f"EPSG:{code} is not in the bundled catalog "
                     f"({len(_GEOG) + len(_GEOCENT) + len(_PROJECTED)} "
                     f"codes supported)")


def all_codes():
    """All supported (authority, code, kind, name) rows — backs the
    catalog_api DataFrame queries (reference pyproj/database.pyx:82-126)."""
    rows = []
    for c, (name, datum, axis, *_pm) in _GEOG.items():
        kind = ("GEOGRAPHIC_3D_CRS" if c in _GEOG_3D_CODES
                else "GEOGRAPHIC_2D_CRS")
        rows.append(("EPSG", c, kind, name, datum))
    for c, (name, datum) in _GEOCENT.items():
        rows.append(("EPSG", c, "GEOCENTRIC_CRS", name, datum))
    for c, (name, datum, *_rest) in _PROJECTED.items():
        rows.append(("EPSG", c, "PROJECTED_CRS", name, datum))
    return rows
