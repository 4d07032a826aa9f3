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
    # NAD83(2011) — ITRF-era US realization, GRS80, null shift like
    # NAD83/NAD83(CSRS) at this catalog's accuracy tier
    "NAD83_2011": ("GRS80", (0, 0, 0)),
    # Amersfoort (Netherlands) — EPSG coordinate-frame rotation 15934
    # (the well-known RDNAPTRANS 7-parameter set PROJ ships for 4289)
    "Amersfoort": ("bessel", (565.417, 50.3319, 465.552,
                              -0.398957, 0.343988, -1.8774, 4.0725)),
    # Israel 1993 — EPSG transformation 1073 (geocentric translations)
    "Israel1993": ("GRS80", (-48.0, 55.0, 52.0)),
    "GDM2000": ("GRS80", (0, 0, 0)),
    "NAD83_CSRS": ("GRS80", (0, 0, 0)),
    # EPSG:1237 "WGS 72 to WGS 84 (1)": dz=4.5 m, rz=0.554", ds=0.2263 ppm
    "WGS72": ("WGS72", (0, 0, 4.5, 0, 0, 0.554, 0.2263)),
    # EPSG:1676 "CH1903 to WGS 84 (1)" / EPSG:1647 "CH1903+ to WGS 84 (1)"
    "CH1903": ("bessel", (674.4, 15.1, 405.3)),
    "CH1903plus": ("bessel", (674.374, 15.056, 405.346)),
    # EPSG:1254 "Pulkovo 1942 to WGS 84 (1)" (geocentric translations)
    "pulkovo42": ("krass", (28.0, -130.0, -95.0)),
    # Japanese Geodetic Datum 2000 / 2011 — ITRF-aligned, GRS80
    "JGD2000": ("GRS80", (0, 0, 0)),
    "JGD2011": ("GRS80", (0, 0, 0)),
    # EPSG:15929 "BD72 to WGS 84 (3)" (coordinate-frame 7-param)
    "belge72": ("intl", (-106.8686, 52.2978, -103.7239,
                         0.3366, -0.457, 1.8422, -1.2747)),
    # EPSG:1622 "S-JTSK to WGS 84 (1)" (geocentric translations)
    "sjtsk": ("bessel", (589.0, 76.0, 480.0)),
}

#: deprecated EPSG codes -> their non-deprecated successors (reference
#: proj.db deprecation table; CRS.is_deprecated / get_non_deprecated)
DEPRECATED = {
    4140: [4617],  # NAD83(CSRS98) -> NAD83(CSRS)
}


def _dms(deg: float, minutes: float = 0.0) -> float:
    """EPSG sexagesimal parameter -> decimal degrees (sign on deg)."""
    s = -1.0 if deg < 0 else 1.0
    return s * (abs(deg) + minutes / 60.0)

_GEOG = {
    # 4-tuple entries carry a non-Greenwich prime meridian name
    4807: ("NTF (Paris) / geographic 2D", "NTF", "neu", "paris"),
    4275: ("NTF / geographic 2D", "NTF", "neu"),
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
    4149: ("CH1903 / geographic 2D", "CH1903", "neu"),
    4150: ("CH1903+ / geographic 2D", "CH1903plus", "neu"),
    4284: ("Pulkovo 1942 / geographic 2D", "pulkovo42", "neu"),
    4314: ("DHDN / geographic 2D", "potsdam", "neu"),
    4612: ("JGD2000 / geographic 2D", "JGD2000", "neu"),
    6668: ("JGD2011 / geographic 2D", "JGD2011", "neu"),
    4313: ("BD72 / geographic 2D", "belge72", "neu"),
    4156: ("S-JTSK / geographic 2D", "sjtsk", "neu"),
    4674: ("SIRGAS 2000 / geographic 2D", "SIRGAS2000", "neu"),
    4167: ("NZGD2000 / geographic 2D", "NZGD2000", "neu"),
    6318: ("NAD83(2011) / geographic 2D", "NAD83_2011", "neu"),
    4289: ("Amersfoort / geographic 2D", "Amersfoort", "neu"),
    4141: ("Israel 1993 / geographic 2D", "Israel1993", "neu"),
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
    # Swiss grids: lat_0 46°57'08.66"N, lon_0 7°26'22.50"E (Bern)
    21781: ("CH1903 / LV03", "CH1903",
            dict(proj="somerc", lat_0=46.952405555555565,
                 lon_0=7.439583333333333, k_0=1.0,
                 x_0=600000, y_0=200000), "enu", 1.0),
    2056: ("CH1903+ / LV95", "CH1903plus",
           dict(proj="somerc", lat_0=46.952405555555565,
                lon_0=7.439583333333333, k_0=1.0,
                x_0=2600000, y_0=1200000), "enu", 1.0),
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
# GDA2020 / MGA zones 46-59 (EPSG 7846-7859; 46/47 cover the Cocos
# and Christmas Island extensions added with GDA2020)
for _z in range(46, 60):
    _PROJECTED[7800 + _z] = (
        f"GDA2020 / MGA zone {_z}", "GDA2020",
        dict(proj="utm", zone=_z, south=True), "enu", 1.0)
# SIRGAS 2000 / UTM zones 11N-22N (EPSG 31965-31976) and 17S-25S
# (EPSG 31977-31985)
for _z in range(11, 23):
    _PROJECTED[31954 + _z] = (
        f"SIRGAS 2000 / UTM zone {_z}N", "SIRGAS2000",
        dict(proj="utm", zone=_z), "enu", 1.0)
for _z in range(17, 26):
    _PROJECTED[31960 + _z] = (
        f"SIRGAS 2000 / UTM zone {_z}S", "SIRGAS2000",
        dict(proj="utm", zone=_z, south=True), "enu", 1.0)
# Norway NTM zones 5-30 (EPSG 5105-5130): ETRS89 tmerc with k_0 = 1,
# lat_0 = 58, x_0 = 100 000, y_0 = 1 000 000, central meridians at
# zone + 0.5 degrees — the construction-survey ladder used where
# UTM's 0.9996 scale error is out of tolerance.
for _z in range(5, 31):
    _PROJECTED[5100 + _z] = (
        f"ETRS89 / NTM zone {_z}", "ETRS89",
        dict(proj="tmerc", lat_0=58, lon_0=_z + 0.5, k_0=1.0,
             x_0=100000, y_0=1000000), "neu", 1.0)
# SWEREF99 local projection zones (EPSG 3007-3018): the Swedish
# municipal ladder replacing RT90 — tmerc, k_0 = 1 exactly,
# x_0 = 150 000, central meridians on a 12..23.25-degree comb
# (registry order is 12 00, 13 30, ..., then the quarter-degree
# in-fill 14 15 ... 23 15). N,E axis order like SWEREF99 TM.
for _i, (_nm, _cm) in enumerate([
        ("12 00", 12.0), ("13 30", 13.5), ("15 00", 15.0),
        ("16 30", 16.5), ("18 00", 18.0), ("14 15", 14.25),
        ("15 45", 15.75), ("17 15", 17.25), ("18 45", 18.75),
        ("20 15", 20.25), ("21 45", 21.75), ("23 15", 23.25)]):
    _PROJECTED[3007 + _i] = (
        f"SWEREF99 {_nm}", "SWEREF99",
        dict(proj="tmerc", lat_0=0, lon_0=_cm, k_0=1.0,
             x_0=150000, y_0=0), "neu", 1.0)

_PROJECTED.update({
    # Dutch national grid — EPSG method 9809 double stereographic
    # (kernels/projections.py ObliqueStereographicAlternative;
    # EPSG GN7-2 worked example asserted in tests/test_projections.py)
    28992: ("Amersfoort / RD New", "Amersfoort",
            dict(proj="sterea", lat_0=52.15616055555555,
                 lon_0=5.38763888888889, k_0=0.9999079,
                 x_0=155000.0, y_0=463000.0), "enu", 1.0),
    3347: ("NAD83 / Statistics Canada Lambert", "NAD83",
           dict(proj="lcc", lat_1=49.0, lat_2=77.0, lat_0=63.390675,
                lon_0=-91.86666666666666, x_0=6200000.0,
                y_0=3000000.0), "enu", 1.0),
    3978: ("NAD83 / Canada Atlas Lambert", "NAD83",
           dict(proj="lcc", lat_1=49.0, lat_2=77.0, lat_0=49.0,
                lon_0=-95.0, x_0=0.0, y_0=0.0), "enu", 1.0),
    3979: ("NAD83(CSRS) / Canada Atlas Lambert", "NAD83_CSRS",
           dict(proj="lcc", lat_1=49.0, lat_2=77.0, lat_0=49.0,
                lon_0=-95.0, x_0=0.0, y_0=0.0), "enu", 1.0),
    6350: ("NAD83(2011) / Conus Albers", "NAD83_2011",
           dict(proj="aea", lat_1=29.5, lat_2=45.5, lat_0=23.0,
                lon_0=-96.0, x_0=0.0, y_0=0.0), "enu", 1.0),
    # Israeli TM Grid — EPSG 2039 natural-origin parameters
    2039: ("Israel 1993 / Israeli TM Grid", "Israel1993",
           dict(proj="tmerc", lat_0=31.73439361111111,
                lon_0=35.20451694444445, k_0=1.0000067,
                x_0=219529.584, y_0=626907.39), "enu", 1.0),
    # polar-science workhorses
    # pan-European statistical mapping pair to 3035 (LAEA)
    3034: ("ETRS89-extended / LCC Europe", "ETRS89",
           dict(proj="lcc", lat_1=35.0, lat_2=65.0, lat_0=52.0,
                lon_0=10.0, x_0=4000000.0, y_0=2800000.0), "enu", 1.0),
    # Pacific-centred Mercator (Pacific Disaster Center)
    3832: ("WGS 84 / PDC Mercator", "WGS84",
           dict(proj="merc", lon_0=150.0, lat_ts=0.0, x_0=0.0,
                y_0=0.0), "enu", 1.0),
    3995: ("WGS 84 / Arctic Polar Stereographic", "WGS84",
           dict(proj="stere", lat_0=90.0, lat_ts=71.0, lon_0=0.0,
                x_0=0.0, y_0=0.0), "enu", 1.0),
    5041: ("WGS 84 / UPS North (E,N)", "WGS84",
           dict(proj="stere", lat_0=90.0, k_0=0.994, lon_0=0.0,
                x_0=2000000.0, y_0=2000000.0), "enu", 1.0),
    5042: ("WGS 84 / UPS South (E,N)", "WGS84",
           dict(proj="stere", lat_0=-90.0, k_0=0.994, lon_0=0.0,
                x_0=2000000.0, y_0=2000000.0), "enu", 1.0),
    4087: ("WGS 84 / World Equidistant Cylindrical", "WGS84",
           dict(proj="eqc", lat_ts=0.0, lon_0=0.0, x_0=0.0, y_0=0.0),
           "enu", 1.0),
    3577: ("GDA94 / Australian Albers", "GDA94",
           dict(proj="aea", lat_1=-18.0, lat_2=-36.0, lat_0=0.0,
                lon_0=132.0, x_0=0.0, y_0=0.0), "enu", 1.0),
    5243: ("ETRS89 / LCC Germany (E-N)", "ETRS89",
           dict(proj="lcc", lat_1=48.66666666666666,
                lat_2=53.66666666666666, lat_0=51.0, lon_0=10.5,
                x_0=0.0, y_0=0.0), "enu", 1.0),
    # Equal Earth family (EPSG method 1078)
    8857: ("WGS 84 / Equal Earth Greenwich", "WGS84",
           dict(proj="eqearth", lon_0=0.0, x_0=0.0, y_0=0.0),
           "enu", 1.0),
    8858: ("WGS 84 / Equal Earth Americas", "WGS84",
           dict(proj="eqearth", lon_0=-90.0, x_0=0.0, y_0=0.0),
           "enu", 1.0),
    8859: ("WGS 84 / Equal Earth Asia-Pacific", "WGS84",
           dict(proj="eqearth", lon_0=150.0, x_0=0.0, y_0=0.0),
           "enu", 1.0),
})
# North Pole LAEA regional family (EPSG 3571-3576): laea at the pole,
# per-region central meridian
for _c, _reg, _lon in ((3571, "Bering Sea", 180.0),
                       (3572, "Alaska", -150.0),
                       (3573, "Canada", -100.0),
                       (3574, "North Atlantic", -40.0),
                       (3575, "Europe", 10.0),
                       (3576, "Russia", 90.0)):
    _PROJECTED[_c] = (
        f"WGS 84 / North Pole LAEA {_reg}", "WGS84",
        dict(proj="laea", lat_0=90.0, lon_0=_lon, x_0=0.0, y_0=0.0),
        "enu", 1.0)
# RGF93 conic-conformal zone family CC42-CC50 (EPSG 3942-3950):
# 1-degree latitude bands, lat_0 = 42+i, parallels at lat_0 +/- 0.75,
# y_0 climbing 1,000,000 m per band
for _i in range(9):
    _lat0 = 42.0 + _i
    _PROJECTED[3942 + _i] = (
        f"RGF93 v1 / CC{42 + _i}", "RGF93",
        dict(proj="lcc", lat_1=_lat0 - 0.75, lat_2=_lat0 + 0.75,
             lat_0=_lat0, lon_0=3.0, x_0=1700000.0,
             y_0=1200000.0 + _i * 1000000.0), "enu", 1.0)

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
# NAD27 UTM zones 1N-22N (EPSG 26701-26722)
for _z in range(1, 23):
    _PROJECTED[26700 + _z] = (
        f"NAD27 / UTM zone {_z}N", "NAD27", dict(proj="utm", zone=_z),
        "enu", 1.0)

# Austria: MGI Gauss-Kruger belts (Bessel 1841, Ferro-free lon_0 in
# Greenwich degrees; y_0 = -5,000,000 strips the leading 5). The MGI
# -> WGS84 7-parameter set is the registry's standard Austria
# transformation (EPSG 1618).
DATUMS["MGI"] = ("bessel", (577.326, 90.129, 463.919,
                            5.137, 1.474, 5.297, 2.4232))
for _code, _band, _lon, _x0 in (
        (31254, "West", _dms(10, 20), 0.0),
        (31255, "Central", _dms(13, 20), 0.0),
        (31256, "East", _dms(16, 20), 0.0),
        (31257, "M28", _dms(10, 20), 150000.0),
        (31258, "M31", _dms(13, 20), 450000.0),
        (31259, "M34", _dms(16, 20), 750000.0)):
    _PROJECTED[_code] = (
        f"MGI / Austria GK {_band}", "MGI",
        dict(proj="tmerc", lat_0=0.0, lon_0=_lon, k_0=1.0,
             x_0=_x0, y_0=-5000000.0), "enu", 1.0)

# Iceland ISN93 (GRS80 ITRF-aligned, null shift) / Lambert 1993
DATUMS["ISN93"] = ("GRS80", (0, 0, 0))
_PROJECTED[3057] = (
    "ISN93 / Lambert 1993", "ISN93",
    dict(proj="lcc", lat_1=64.25, lat_2=65.75, lat_0=65.0, lon_0=-19.0,
         x_0=500000.0, y_0=500000.0), "enu", 1.0)

# NSIDC Sea Ice Polar Stereographic South (twin of the bundled 3413)
_PROJECTED[3976] = (
    "WGS 84 / NSIDC Sea Ice Polar Stereographic South", "WGS84",
    dict(proj="stere", lat_0=-90, lat_ts=-70, lon_0=0, x_0=0, y_0=0),
    "enu", 1.0)

# Pulkovo 1942 / 6-degree Gauss-Kruger zones 2-32 (EPSG 28402-28432):
# tmerc k=1, lon_0 = 6*zone - 3 (wrapped past the antimeridian for the
# far-eastern zones), zone-prefixed false easting zone*1e6 + 500000.
# EPSG authority axis order is (X=northing, Y=easting) -> "neu".
for _z in range(2, 33):
    _lon0 = 6 * _z - 3
    _PROJECTED[28400 + _z] = (
        f"Pulkovo 1942 / Gauss-Kruger zone {_z}", "pulkovo42",
        dict(proj="tmerc", lat_0=0, lon_0=_lon0 if _lon0 <= 180
             else _lon0 - 360, k_0=1.0,
             x_0=_z * 1_000_000 + 500_000, y_0=0), "neu", 1.0)
# DHDN / 3-degree Gauss-Kruger zones 2-5 (EPSG 31466-31469):
# tmerc k=1, lon_0 = 3*zone, false easting zone*1e6 + 500000, Bessel.
for _z in range(2, 6):
    _PROJECTED[31464 + _z] = (
        f"DHDN / 3-degree Gauss-Kruger zone {_z}", "potsdam",
        dict(proj="tmerc", lat_0=0, lon_0=3 * _z, k_0=1.0,
             x_0=_z * 1_000_000 + 500_000, y_0=0), "neu", 1.0)

# Japan Plane Rectangular CS zones I-XIX (GSI origin table): tmerc
# k=0.9999, x_0=y_0=0, axis (X=northing, Y=easting). JGD2000 zones are
# EPSG 2443-2461; JGD2011 re-issues the same grid as EPSG 6669-6687.
_JPRCS_ORIGINS = (
    (33.0, 129.5), (33.0, 131.0), (36.0, _dms(132, 10)), (33.0, 133.5),
    (36.0, _dms(134, 20)), (36.0, 136.0), (36.0, _dms(137, 10)),
    (36.0, 138.5), (36.0, _dms(139, 50)), (40.0, _dms(140, 50)),
    (44.0, _dms(140, 15)), (44.0, _dms(142, 15)), (44.0, _dms(144, 15)),
    (26.0, 142.0), (26.0, 127.5), (26.0, 124.0), (26.0, 131.0),
    (20.0, 136.0), (26.0, 154.0))
_ROMAN = ("I II III IV V VI VII VIII IX X XI XII XIII XIV XV XVI XVII "
          "XVIII XIX").split()
for _i, (_la0, _lo0) in enumerate(_JPRCS_ORIGINS):
    _p = dict(proj="tmerc", lat_0=_la0, lon_0=_lo0, k_0=0.9999,
              x_0=0, y_0=0)
    _PROJECTED[2443 + _i] = (
        f"JGD2000 / Japan Plane Rectangular CS {_ROMAN[_i]}", "JGD2000",
        dict(_p), "neu", 1.0)
    _PROJECTED[6669 + _i] = (
        f"JGD2011 / Japan Plane Rectangular CS {_ROMAN[_i]}", "JGD2011",
        dict(_p), "neu", 1.0)

# BD72 / Belgian Lambert 72 (EPSG:31370): LCC-2SP with the false
# origin at the north pole (lat_0=90) — exercises the rho0->0 branch.
_PROJECTED[31370] = (
    "BD72 / Belgian Lambert 72", "belge72",
    dict(proj="lcc", lat_1=51.16666723333333, lat_2=49.8333339,
         lat_0=90, lon_0=4.367486666666666,
         x_0=150000.013, y_0=5400088.438), "enu", 1.0)

# DHDN / Soldner Berlin (EPSG:3068): Cassini-Soldner on Bessel with
# the Muggelberg origin (52 deg 25'07.1338"N, 13 deg 37'37.9332"E)
_PROJECTED[3068] = (
    "DHDN / Soldner Berlin", "potsdam",
    dict(proj="cass", lat_0=52.41864827777778, lon_0=13.62720366666667,
         x_0=40000, y_0=10000), "enu", 1.0)

# S-JTSK / Krovak East North (EPSG:5514): EPSG method 9819; the
# engine reproduces the guidance-note worked example to 2 cm
# (tests/test_projections_round5.py::TestKrovak).
_PROJECTED[5514] = (
    "S-JTSK / Krovak East North", "sjtsk",
    dict(proj="krovak", lat_0=49.5, lon_0=24.833333333333332,
         alpha=30.28813972527778, k_0=0.9999, x_0=0, y_0=0),
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



# --------------------------------------------------------------------
# NAD83 State Plane (SPCS83) zones, meters — parameters from the EPSG
# registry / NOAA NOS NGS 13 "State Plane Coordinate System of 1983"
# appendix (the same public source PROJ's proj.db ingests). Latitudes
# are exact degree-minute values; scale factors are the exact 1 - 1/N
# rationals NGS publishes.
#
# LCC-2SP rows: (code, zone name, lat_1, lat_2, lat_0, lon_0, x_0, y_0)
_SPCS_LCC = (
    (26951, "Arkansas North", _dms(34, 56), _dms(36, 14), _dms(34, 20),
     -92.0, 400000, 0),
    (26952, "Arkansas South", _dms(33, 18), _dms(34, 46), _dms(32, 40),
     -92.0, 400000, 400000),
    # Colorado false origin: 3,000,000 / 1,000,000 ftUS in meters
    (26953, "Colorado North", _dms(39, 43), _dms(40, 47), _dms(39, 20),
     -105.5, 914401.8289, 304800.6096),
    (26954, "Colorado Central", _dms(38, 27), _dms(39, 45), _dms(37, 50),
     -105.5, 914401.8289, 304800.6096),
    (26955, "Colorado South", _dms(37, 14), _dms(38, 26), _dms(36, 40),
     -105.5, 914401.8289, 304800.6096),
    (26956, "Connecticut", _dms(41, 12), _dms(41, 52), _dms(40, 50),
     -72.75, 304800.6096, 152400.3048),
    (26960, "Florida North", _dms(29, 35), _dms(30, 45), 29.0,
     -84.5, 600000, 0),
    (26975, "Iowa North", _dms(42, 4), _dms(43, 16), 41.5,
     -93.5, 1500000, 1000000),
    (26976, "Iowa South", _dms(40, 37), _dms(41, 47), 40.0,
     -93.5, 500000, 0),
    (26977, "Kansas North", _dms(38, 43), _dms(39, 47), _dms(38, 20),
     -98.0, 400000, 0),
    (26978, "Kansas South", _dms(37, 16), _dms(38, 34), _dms(36, 40),
     -98.5, 400000, 400000),
    (26981, "Louisiana North", _dms(31, 10), _dms(32, 40), 30.5,
     -92.5, 1000000, 0),
    (26982, "Louisiana South", _dms(29, 18), _dms(30, 42), 28.5,
     _dms(-91, 20), 1000000, 0),
    (26985, "Maryland", _dms(38, 18), _dms(39, 27), _dms(37, 40),
     -77.0, 400000, 0),
    (26986, "Massachusetts Mainland", _dms(41, 43), _dms(42, 41), 41.0,
     -71.5, 200000, 750000),
    (26987, "Massachusetts Island", _dms(41, 17), _dms(41, 29), 41.0,
     -70.5, 500000, 0),
    (26988, "Michigan North", _dms(45, 29), _dms(47, 5), _dms(44, 47),
     -87.0, 8000000, 0),
    (26989, "Michigan Central", _dms(44, 11), _dms(45, 42), _dms(43, 19),
     _dms(-84, 22), 6000000, 0),
    (26990, "Michigan South", _dms(42, 6), _dms(43, 40), 41.5,
     _dms(-84, 22), 4000000, 0),
    (26991, "Minnesota North", _dms(47, 2), _dms(48, 38), 46.5,
     -93.1, 800000, 100000),
    (26992, "Minnesota Central", _dms(45, 37), _dms(47, 3), 45.0,
     -94.25, 800000, 100000),
    (26993, "Minnesota South", _dms(43, 47), _dms(45, 13), 43.0,
     -94.0, 800000, 100000),
    (32100, "Montana", 45.0, 49.0, 44.25, -109.5, 600000, 0),
    (32104, "Nebraska", 40.0, 43.0, _dms(39, 50), -100.0, 500000, 0),
    (32118, "New York Long Island", _dms(40, 40), _dms(41, 2),
     _dms(40, 10), -74.0, 300000, 0),
    # NC false easting: 2,000,000 ftUS as EPSG's rounded meters
    (32119, "North Carolina", _dms(34, 20), _dms(36, 10), _dms(33, 45),
     -79.0, 609601.22, 0),
    (32120, "North Dakota North", _dms(47, 26), _dms(48, 44), 47.0,
     -100.5, 600000, 0),
    (32121, "North Dakota South", _dms(46, 11), _dms(47, 29),
     _dms(45, 40), -100.5, 600000, 0),
    (32122, "Ohio North", _dms(40, 26), _dms(41, 42), _dms(39, 40),
     -82.5, 600000, 0),
    (32123, "Ohio South", _dms(38, 44), _dms(40, 2), 38.0,
     -82.5, 600000, 0),
    (32124, "Oklahoma North", _dms(35, 34), _dms(36, 46), 35.0,
     -98.0, 600000, 0),
    (32125, "Oklahoma South", _dms(33, 56), _dms(35, 14), _dms(33, 20),
     -98.0, 600000, 0),
    (32126, "Oregon North", _dms(44, 20), 46.0, _dms(43, 40),
     -120.5, 2500000, 0),
    (32127, "Oregon South", _dms(42, 20), 44.0, _dms(41, 40),
     -120.5, 1500000, 0),
    (32128, "Pennsylvania North", _dms(40, 53), _dms(41, 57),
     _dms(40, 10), _dms(-77, 45), 600000, 0),
    (32129, "Pennsylvania South", _dms(39, 56), _dms(40, 58),
     _dms(39, 20), _dms(-77, 45), 600000, 0),
    # SC false easting: 2,000,000 international feet = 609,600 m exact
    (32133, "South Carolina", 32.5, _dms(34, 50), _dms(31, 50),
     -81.0, 609600, 0),
    (32134, "South Dakota North", _dms(44, 25), _dms(45, 41),
     _dms(43, 50), -100.0, 600000, 0),
    (32135, "South Dakota South", _dms(42, 50), _dms(44, 24),
     _dms(42, 20), _dms(-100, 20), 600000, 0),
    (32136, "Tennessee", _dms(35, 15), _dms(36, 25), _dms(34, 20),
     -86.0, 600000, 0),
    (32137, "Texas North", _dms(34, 39), _dms(36, 11), 34.0,
     -101.5, 200000, 1000000),
    (32138, "Texas North Central", _dms(32, 8), _dms(33, 58),
     _dms(31, 40), -98.5, 600000, 2000000),
    (32139, "Texas Central", _dms(30, 7), _dms(31, 53), _dms(29, 40),
     _dms(-100, 20), 700000, 3000000),
    (32140, "Texas South Central", _dms(28, 23), _dms(30, 17),
     _dms(27, 50), -99.0, 600000, 4000000),
    (32141, "Texas South", _dms(26, 10), _dms(27, 50), _dms(25, 40),
     -98.5, 300000, 5000000),
    (32142, "Utah North", _dms(40, 43), _dms(41, 47), _dms(40, 20),
     -111.5, 500000, 1000000),
    (32143, "Utah Central", _dms(39, 1), _dms(40, 39), _dms(38, 20),
     -111.5, 500000, 2000000),
    (32144, "Utah South", _dms(37, 13), _dms(38, 21), _dms(36, 40),
     -111.5, 500000, 3000000),
    (32146, "Virginia North", _dms(38, 2), _dms(39, 12), _dms(37, 40),
     -78.5, 3500000, 2000000),
    (32147, "Virginia South", _dms(36, 46), _dms(37, 58), _dms(36, 20),
     -78.5, 3500000, 1000000),
    (32148, "Washington North", 47.5, _dms(48, 44), 47.0,
     _dms(-120, 50), 500000, 0),
    (32149, "Washington South", _dms(45, 50), _dms(47, 20),
     _dms(45, 20), -120.5, 500000, 0),
    (32150, "West Virginia North", 39.0, 40.25, 38.5,
     -79.5, 600000, 0),
    (32151, "West Virginia South", _dms(37, 29), _dms(38, 53), 37.0,
     -81.0, 600000, 0),
    (32152, "Wisconsin North", _dms(45, 34), _dms(46, 46), _dms(45, 10),
     -90.0, 600000, 0),
    (32153, "Wisconsin Central", 44.25, 45.5, _dms(43, 50),
     -90.0, 600000, 0),
    (32154, "Wisconsin South", _dms(42, 44), _dms(44, 4), 42.0,
     -90.0, 600000, 0),
    (26940, "Alaska zone 10", _dms(51, 50), _dms(53, 50), 51.0,
     -176.0, 1000000, 0),
)
for _c, _n, _l1, _l2, _l0, _lon, _x0, _y0 in _SPCS_LCC:
    _PROJECTED[_c] = (
        f"NAD83 / {_n}", "NAD83",
        dict(proj="lcc", lat_1=_l1, lat_2=_l2, lat_0=_l0, lon_0=_lon,
             x_0=float(_x0), y_0=float(_y0)), "enu", 1.0)
# California SPCS83 zones 1-6 in meters (EPSG 26941-26946): the ftUS
# zones above with the metric false origin (2,000,000 / 500,000 m)
for _c in range(2225, 2231):
    _name, _datum, _p, _ax, _tm = _PROJECTED[_c]
    _pm = dict(_p, x_0=2000000.0, y_0=500000.0)
    _PROJECTED[26941 + (_c - 2225)] = (
        _name.replace(" (ftUS)", ""), "NAD83", _pm, "enu", 1.0)

# Transverse-Mercator SPCS83 zones:
# (code, zone name, lat_0, lon_0, k_0 denominator N in 1 - 1/N
#  (None -> k_0 = 1), x_0, y_0)
_SPCS_TM = (
    (26929, "Alabama East", 30.5, _dms(-85, 50), 25000, 200000, 0),
    (26930, "Alabama West", 30.0, -87.5, 15000, 600000, 0),
    (26948, "Arizona East", 31.0, _dms(-110, 10), 10000, 213360, 0),
    (26949, "Arizona Central", 31.0, _dms(-111, 55), 10000, 213360, 0),
    (26950, "Arizona West", 31.0, _dms(-113, 45), 15000, 213360, 0),
    (26957, "Delaware", 38.0, _dms(-75, 25), 200000, 200000, 0),
    (26958, "Florida East", _dms(24, 20), -81.0, 17000, 200000, 0),
    (26959, "Florida West", _dms(24, 20), -82.0, 17000, 200000, 0),
    (26966, "Georgia East", 30.0, _dms(-82, 10), 10000, 200000, 0),
    (26967, "Georgia West", 30.0, _dms(-84, 10), 10000, 700000, 0),
    (26961, "Hawaii zone 1", _dms(18, 50), -155.5, 30000, 500000, 0),
    (26962, "Hawaii zone 2", _dms(20, 20), _dms(-156, 40), 30000,
     500000, 0),
    (26963, "Hawaii zone 3", _dms(21, 10), -158.0, 100000, 500000, 0),
    (26964, "Hawaii zone 4", _dms(21, 50), -159.5, 100000, 500000, 0),
    (26965, "Hawaii zone 5", _dms(21, 40), _dms(-160, 10), None,
     500000, 0),
    (26968, "Idaho East", _dms(41, 40), _dms(-112, 10), 19000,
     200000, 0),
    (26969, "Idaho Central", _dms(41, 40), -114.0, 19000, 500000, 0),
    (26970, "Idaho West", _dms(41, 40), -115.75, 15000, 800000, 0),
    (26971, "Illinois East", _dms(36, 40), _dms(-88, 20), 40000,
     300000, 0),
    (26972, "Illinois West", _dms(36, 40), _dms(-90, 10), 17000,
     700000, 0),
    (26973, "Indiana East", 37.5, _dms(-85, 40), 30000, 100000, 250000),
    (26974, "Indiana West", 37.5, _dms(-87, 5), 30000, 900000, 250000),
    (26983, "Maine East", _dms(43, 40), -68.5, 10000, 300000, 0),
    (26984, "Maine West", _dms(42, 50), _dms(-70, 10), 30000, 900000, 0),
    (26994, "Mississippi East", 29.5, _dms(-88, 50), 20000, 300000, 0),
    (26995, "Mississippi West", 29.5, _dms(-90, 20), 20000, 700000, 0),
    (26996, "Missouri East", _dms(35, 50), -90.5, 15000, 250000, 0),
    (26997, "Missouri Central", _dms(35, 50), -92.5, 15000, 500000, 0),
    (26998, "Missouri West", _dms(36, 10), -94.5, 17000, 850000, 0),
    (32107, "Nevada East", 34.75, _dms(-115, 35), 10000,
     200000, 8000000),
    (32108, "Nevada Central", 34.75, _dms(-116, 40), 10000,
     500000, 6000000),
    (32109, "Nevada West", 34.75, _dms(-118, 35), 10000,
     800000, 4000000),
    (32110, "New Hampshire", 42.5, _dms(-71, 40), 30000, 300000, 0),
    (32111, "New Jersey", _dms(38, 50), -74.5, 10000, 150000, 0),
    (32112, "New Mexico East", 31.0, _dms(-104, 20), 11000, 165000, 0),
    (32113, "New Mexico Central", 31.0, -106.25, 10000, 500000, 0),
    (32114, "New Mexico West", 31.0, _dms(-107, 50), 12000, 830000, 0),
    (32115, "New York East", _dms(38, 50), -74.5, 10000, 150000, 0),
    (32116, "New York Central", 40.0, _dms(-76, 35), 16000, 250000, 0),
    (32117, "New York West", 40.0, _dms(-78, 35), 16000, 350000, 0),
    (32130, "Rhode Island", _dms(41, 5), -71.5, 160000, 100000, 0),
    (32145, "Vermont", 42.5, -72.5, 28000, 500000, 0),
    (32155, "Wyoming East", 40.5, _dms(-105, 10), 16000, 200000, 0),
    (32156, "Wyoming East Central", 40.5, _dms(-107, 20), 16000,
     400000, 100000),
    (32157, "Wyoming West Central", 40.5, -108.75, 16000, 600000, 0),
    (32158, "Wyoming West", 40.5, _dms(-110, 5), 16000, 800000, 100000),
) + tuple(
    # Alaska zones 2-9: 4-degree TM strips, lon_0 = -142 - 4*(z - 2)
    (26930 + _z, f"Alaska zone {_z}", 54.0, -142.0 - 4.0 * (_z - 2),
     10000, 500000, 0)
    for _z in range(2, 10)
)
for _c, _n, _l0, _lon, _kden, _x0, _y0 in _SPCS_TM:
    _k0 = 1.0 if _kden is None else 1.0 - 1.0 / _kden
    _PROJECTED[_c] = (
        f"NAD83 / {_n}", "NAD83",
        dict(proj="tmerc", lat_0=_l0, lon_0=_lon, k_0=_k0,
             x_0=float(_x0), y_0=float(_y0)), "enu", 1.0)


# --------------------------------------------------------------------
# NAD27 State Plane (SPCS27) zones, US survey foot — parameters from
# the NOAA/NOS C&GS Special Publication 235 zone constant tables (the
# public source the EPSG registry ingests for the 26729-26798 /
# 32001-32058 ranges). Curated verify-or-exclude subset: zones whose
# constants could be cross-checked are included; LA/MD/MS/MI/NJ/NY/
# OK-S/TN/WY/AK and NY Long Island are EXCLUDED rather than guessed
# (the builder policy — an absent code raises CRSError, a wrong one
# would mis-project silently).
#
# LCC-2SP rows: (code, zone, lat_1, lat_2, lat_0, lon_0, x_0 ftUS,
# y_0 ftUS). x_0 = 2,000,000 ftUS / y_0 = 0 unless stated (CT).
_SPCS27_LCC = (
    (26741, "California zone I", 40.0, _dms(41, 40), _dms(39, 20),
     -122.0, 2000000, 0),
    (26742, "California zone II", _dms(38, 20), _dms(39, 50),
     _dms(37, 40), -122.0, 2000000, 0),
    (26743, "California zone III", _dms(37, 4), _dms(38, 26), 36.5,
     -120.5, 2000000, 0),
    (26744, "California zone IV", 36.0, 37.25, _dms(35, 20), -119.0,
     2000000, 0),
    (26745, "California zone V", _dms(34, 2), _dms(35, 28), 33.5,
     -118.0, 2000000, 0),
    (26746, "California zone VI", _dms(32, 47), _dms(33, 53),
     _dms(32, 10), -116.25, 2000000, 0),
    (26751, "Arkansas North", _dms(34, 56), _dms(36, 14), _dms(34, 20),
     -92.0, 2000000, 0),
    (26752, "Arkansas South", _dms(33, 18), _dms(34, 46), _dms(32, 40),
     -92.0, 2000000, 0),
    (26753, "Colorado North", _dms(39, 43), _dms(40, 47), _dms(39, 20),
     -105.5, 2000000, 0),
    (26754, "Colorado Central", _dms(38, 27), _dms(39, 45),
     _dms(37, 50), -105.5, 2000000, 0),
    (26755, "Colorado South", _dms(37, 14), _dms(38, 26), _dms(36, 40),
     -105.5, 2000000, 0),
    (26756, "Connecticut", _dms(41, 12), _dms(41, 52), _dms(40, 50),
     -72.75, 600000, 0),
    (26760, "Florida North", _dms(29, 35), _dms(30, 45), 29.0, -84.5,
     2000000, 0),
    (26775, "Iowa North", _dms(42, 4), _dms(43, 16), 41.5, -93.5,
     2000000, 0),
    (26776, "Iowa South", _dms(40, 37), _dms(41, 47), 40.0, -93.5,
     2000000, 0),
    (26777, "Kansas North", _dms(38, 43), _dms(39, 47), _dms(38, 20),
     -98.0, 2000000, 0),
    (26778, "Kansas South", _dms(37, 16), _dms(38, 34), _dms(36, 40),
     -98.5, 2000000, 0),
    (26779, "Kentucky North", _dms(37, 58), _dms(38, 58), 37.5,
     -84.25, 2000000, 0),
    (26780, "Kentucky South", _dms(36, 44), _dms(37, 56), _dms(36, 20),
     -85.75, 2000000, 0),
    (26791, "Minnesota North", _dms(47, 2), _dms(48, 38), 46.5,
     _dms(-93, 6), 2000000, 0),
    (26792, "Minnesota Central", _dms(45, 37), _dms(47, 3), 45.0,
     -94.25, 2000000, 0),
    (26793, "Minnesota South", _dms(43, 47), _dms(45, 13), 43.0,
     -94.0, 2000000, 0),
    (32001, "Montana North", _dms(47, 51), _dms(48, 43), 47.0, -109.5,
     2000000, 0),
    (32002, "Montana Central", _dms(46, 27), _dms(47, 53),
     _dms(45, 50), -109.5, 2000000, 0),
    (32003, "Montana South", _dms(44, 52), _dms(46, 24), 44.0, -109.5,
     2000000, 0),
    (32005, "Nebraska North", _dms(41, 51), _dms(42, 49), _dms(41, 20),
     -100.0, 2000000, 0),
    (32006, "Nebraska South", _dms(40, 17), _dms(41, 43), _dms(39, 40),
     -99.5, 2000000, 0),
    (32019, "North Carolina", _dms(34, 20), _dms(36, 10), _dms(33, 45),
     -79.0, 2000000, 0),
    (32020, "North Dakota North", _dms(47, 26), _dms(48, 44), 47.0,
     -100.5, 2000000, 0),
    (32021, "North Dakota South", _dms(46, 11), _dms(47, 29),
     _dms(45, 40), -100.5, 2000000, 0),
    (32022, "Ohio North", _dms(40, 26), _dms(41, 42), _dms(39, 40),
     -82.5, 2000000, 0),
    (32023, "Ohio South", _dms(38, 44), _dms(40, 2), 38.0, -82.5,
     2000000, 0),
    (32024, "Oklahoma North", _dms(35, 34), _dms(36, 46), 35.0, -98.0,
     2000000, 0),
    (32026, "Oregon North", _dms(44, 20), 46.0, _dms(43, 40), -120.5,
     2000000, 0),
    (32027, "Oregon South", _dms(42, 20), 44.0, _dms(41, 40), -120.5,
     2000000, 0),
    (32028, "Pennsylvania North", _dms(40, 53), _dms(41, 57),
     _dms(40, 10), -77.75, 2000000, 0),
    (32029, "Pennsylvania South", _dms(39, 56), _dms(40, 58),
     _dms(39, 20), -77.75, 2000000, 0),
    (32031, "South Carolina North", _dms(33, 46), _dms(34, 58), 33.0,
     -81.0, 2000000, 0),
    (32033, "South Carolina South", _dms(32, 20), _dms(33, 40),
     _dms(31, 50), -81.0, 2000000, 0),
    (32034, "South Dakota North", _dms(44, 25), _dms(45, 41),
     _dms(43, 50), -100.0, 2000000, 0),
    (32035, "South Dakota South", _dms(42, 50), _dms(44, 24),
     _dms(42, 20), _dms(-100, 20), 2000000, 0),
    (32037, "Texas North", _dms(34, 39), _dms(36, 11), 34.0, -101.5,
     2000000, 0),
    (32038, "Texas North Central", _dms(32, 8), _dms(33, 58),
     _dms(31, 40), -97.5, 2000000, 0),
    (32039, "Texas Central", _dms(30, 7), _dms(31, 53), _dms(29, 40),
     _dms(-100, 20), 2000000, 0),
    (32040, "Texas South Central", _dms(28, 23), _dms(30, 17),
     _dms(27, 50), -99.0, 2000000, 0),
    (32041, "Texas South", _dms(26, 10), _dms(27, 50), _dms(25, 40),
     -98.5, 2000000, 0),
    (32042, "Utah North", _dms(40, 43), _dms(41, 47), _dms(40, 20),
     -111.5, 2000000, 0),
    (32043, "Utah Central", _dms(39, 1), _dms(40, 39), _dms(38, 20),
     -111.5, 2000000, 0),
    (32044, "Utah South", _dms(37, 13), _dms(38, 21), _dms(36, 40),
     -111.5, 2000000, 0),
    (32046, "Virginia North", _dms(38, 2), _dms(39, 12), _dms(37, 40),
     -78.5, 2000000, 0),
    (32047, "Virginia South", _dms(36, 46), _dms(37, 58), _dms(36, 20),
     -78.5, 2000000, 0),
    (32048, "Washington North", 47.5, _dms(48, 44), 47.0,
     _dms(-120, 50), 2000000, 0),
    (32049, "Washington South", _dms(45, 50), _dms(47, 20),
     _dms(45, 20), -120.5, 2000000, 0),
    (32050, "West Virginia North", 39.0, 40.25, 38.5, -79.5,
     2000000, 0),
    (32051, "West Virginia South", _dms(37, 29), _dms(38, 53), 37.0,
     -81.0, 2000000, 0),
    (32052, "Wisconsin North", _dms(45, 34), _dms(46, 46),
     _dms(45, 10), -90.0, 2000000, 0),
    (32053, "Wisconsin Central", 44.25, 45.5, _dms(43, 50), -90.0,
     2000000, 0),
    (32054, "Wisconsin South", _dms(42, 44), _dms(44, 4), 42.0, -90.0,
     2000000, 0),
)
for _c, _n, _l1, _l2, _l0, _lon, _x0, _y0 in _SPCS27_LCC:
    _PROJECTED[_c] = (
        f"NAD27 / {_n}", "NAD27",
        dict(proj="lcc", lat_1=_l1, lat_2=_l2, lat_0=_l0, lon_0=_lon,
             x_0=_x0 * US_FT, y_0=_y0 * US_FT), "enu", US_FT)

# SPCS27 TM rows: (code, zone, lat_0, lon_0, k_0 denominator N in
# 1 - 1/N, x_0 ftUS); y_0 = 0, x_0 = 500,000 ftUS throughout.
_SPCS27_TM = (
    (26729, "Alabama East", 30.5, _dms(-85, 50), 25000),
    (26730, "Alabama West", 30.0, -87.5, 15000),
    (26748, "Arizona East", 31.0, _dms(-110, 10), 10000),
    (26749, "Arizona Central", 31.0, _dms(-111, 55), 10000),
    (26750, "Arizona West", 31.0, _dms(-113, 45), 15000),
    (26757, "Delaware", 38.0, _dms(-75, 25), 200000),
    (26758, "Florida East", _dms(24, 20), -81.0, 17000),
    (26759, "Florida West", _dms(24, 20), -82.0, 17000),
    (26766, "Georgia East", 30.0, _dms(-82, 10), 10000),
    (26767, "Georgia West", 30.0, _dms(-84, 10), 10000),
    (26768, "Idaho East", _dms(41, 40), _dms(-112, 10), 19000),
    (26769, "Idaho Central", _dms(41, 40), -114.0, 19000),
    (26770, "Idaho West", _dms(41, 40), -115.75, 15000),
    (26771, "Illinois East", _dms(36, 40), _dms(-88, 20), 40000),
    (26772, "Illinois West", _dms(36, 40), _dms(-90, 10), 17000),
    (26773, "Indiana East", 37.5, _dms(-85, 40), 30000),
    (26774, "Indiana West", 37.5, _dms(-87, 5), 30000),
    (26783, "Maine East", _dms(43, 50), -68.5, 10000),
    (26784, "Maine West", _dms(42, 50), _dms(-70, 10), 30000),
    (26796, "Missouri East", _dms(35, 50), -90.5, 15000),
    (26797, "Missouri Central", _dms(35, 50), -92.5, 15000),
    (26798, "Missouri West", _dms(36, 10), -94.5, 17000),
    (32007, "Nevada East", 34.75, _dms(-115, 35), 10000),
    (32008, "Nevada Central", 34.75, _dms(-116, 40), 10000),
    (32009, "Nevada West", 34.75, _dms(-118, 35), 10000),
    (32010, "New Hampshire", 42.5, _dms(-71, 40), 30000),
    (32012, "New Mexico East", 31.0, _dms(-104, 20), 11000),
    (32013, "New Mexico Central", 31.0, -106.25, 10000),
    (32014, "New Mexico West", 31.0, _dms(-107, 50), 12000),
    (32045, "Vermont", 42.5, -72.5, 28000),
)
for _c, _n, _l0, _lon, _kden in _SPCS27_TM:
    _PROJECTED[_c] = (
        f"NAD27 / {_n}", "NAD27",
        dict(proj="tmerc", lat_0=_l0, lon_0=_lon, k_0=1.0 - 1.0 / _kden,
             x_0=500000 * US_FT, y_0=0.0), "enu", US_FT)


DATUMS.update({
    # ITRF-aligned national realizations — GRS80, null shift at this
    # catalog's accuracy tier (same convention as ETRS89/GDA2020)
    "Korea2000": ("GRS80", (0, 0, 0)),
    "LKS94": ("GRS80", (0, 0, 0)),
    "LKS92": ("GRS80", (0, 0, 0)),
    "D96": ("GRS80", (0, 0, 0)),       # Slovenia 1996
    "IRENET95": ("GRS80", (0, 0, 0)),
    # SVY21 is defined on the WGS84 ellipsoid, null shift
    "SVY21": ("WGS84", (0, 0, 0)),
    # EPSG:1825 "Hong Kong 1980 to WGS 84 (1)" geocentric translations
    "HK1980": ("intl", (-162.619, -276.959, -161.764)),
})

_PROJECTED.update({
    # Korea 2000 (axis order in the registry is Northing, Easting)
    5179: ("Korea 2000 / Unified CS", "Korea2000",
           dict(proj="tmerc", lat_0=38, lon_0=127.5, k_0=0.9996,
                x_0=1000000, y_0=2000000), "neu", 1.0),
    5186: ("Korea 2000 / Central Belt 2010", "Korea2000",
           dict(proj="tmerc", lat_0=38, lon_0=127, k_0=1.0,
                x_0=200000, y_0=600000), "neu", 1.0),
    # Portugal TM06: lat_0 39°40'05.73"N, lon_0 8°07'59.19"W
    3763: ("ETRS89 / Portugal TM06", "ETRS89",
           dict(proj="tmerc", lat_0=39.66825833333333,
                lon_0=-8.133108333333334, k_0=1.0, x_0=0, y_0=0),
           "enu", 1.0),
    # Poland: CS92 nationwide + CS2000 3-degree belts 5-8 (all N,E)
    2180: ("ETRS89 / Poland CS92", "ETRS89",
           dict(proj="tmerc", lat_0=0, lon_0=19, k_0=0.9993,
                x_0=500000, y_0=-5300000), "neu", 1.0),
    2176: ("ETRS89 / Poland CS2000 zone 5", "ETRS89",
           dict(proj="tmerc", lat_0=0, lon_0=15, k_0=0.999923,
                x_0=5500000, y_0=0), "neu", 1.0),
    2177: ("ETRS89 / Poland CS2000 zone 6", "ETRS89",
           dict(proj="tmerc", lat_0=0, lon_0=18, k_0=0.999923,
                x_0=6500000, y_0=0), "neu", 1.0),
    2178: ("ETRS89 / Poland CS2000 zone 7", "ETRS89",
           dict(proj="tmerc", lat_0=0, lon_0=21, k_0=0.999923,
                x_0=7500000, y_0=0), "neu", 1.0),
    2179: ("ETRS89 / Poland CS2000 zone 8", "ETRS89",
           dict(proj="tmerc", lat_0=0, lon_0=24, k_0=0.999923,
                x_0=8500000, y_0=0), "neu", 1.0),
    # Belgian Lambert 2008 (the BD72 Lambert 72 sibling is 31370)
    3812: ("ETRS89 / Belgian Lambert 2008", "ETRS89",
           dict(proj="lcc", lat_1=49.833333333333336,
                lat_2=51.166666666666664, lat_0=50.797815,
                lon_0=4.359215833333333, x_0=649328.0, y_0=665262.0),
           "enu", 1.0),
    # Baltic TM family (registry axis order Northing, Easting)
    3301: ("ETRS89 / Estonian grid 1997", "ETRS89",
           dict(proj="lcc", lat_1=59.33333333333334, lat_2=58.0,
                lat_0=57.51755393055556, lon_0=24,
                x_0=500000, y_0=6375000), "neu", 1.0),
    3346: ("LKS94 / Lithuania TM", "LKS94",
           dict(proj="tmerc", lat_0=0, lon_0=24, k_0=0.9998,
                x_0=500000, y_0=0), "neu", 1.0),
    3059: ("LKS92 / Latvia TM", "LKS92",
           dict(proj="tmerc", lat_0=0, lon_0=24, k_0=0.9996,
                x_0=500000, y_0=-6000000), "neu", 1.0),
    3794: ("Slovenia 1996 / Slovene National Grid", "D96",
           dict(proj="tmerc", lat_0=0, lon_0=15, k_0=0.9999,
                x_0=500000, y_0=-5000000), "enu", 1.0),
    2157: ("IRENET95 / Irish Transverse Mercator", "IRENET95",
           dict(proj="tmerc", lat_0=53.5, lon_0=-8, k_0=0.99982,
                x_0=600000, y_0=750000), "enu", 1.0),
    # Singapore: lat_0 1°22'N, lon_0 103°50'E; N,E axis order
    3414: ("SVY21 / Singapore TM", "SVY21",
           dict(proj="tmerc", lat_0=1.3666666666666667,
                lon_0=103.83333333333333, k_0=1.0,
                x_0=28001.642, y_0=38744.572), "neu", 1.0),
    # Hong Kong 1980 Grid: lat_0 22°18'43.68"N, lon_0 114°10'42.80"E
    2326: ("Hong Kong 1980 Grid System", "HK1980",
           dict(proj="tmerc", lat_0=22.312133333333333,
                lon_0=114.17855555555556, k_0=1.0,
                x_0=836694.05, y_0=819069.8), "neu", 1.0),
    # California statewide Albers, NAD83 and NAD83(2011)
    3310: ("NAD83 / California Albers", "NAD83",
           dict(proj="aea", lat_1=34, lat_2=40.5, lat_0=0, lon_0=-120,
                x_0=0, y_0=-4000000), "enu", 1.0),
    6414: ("NAD83(2011) / California Albers", "NAD83_2011",
           dict(proj="aea", lat_1=34, lat_2=40.5, lat_0=0, lon_0=-120,
                x_0=0, y_0=-4000000), "enu", 1.0),
})

# NTF (Paris) / Lambert zones — LCC 1SP with lon_0 = 0 relative to the
# PARIS meridian (the "pm" param; kernels shift longitudes by the
# catalog offset on the way in/out). Zone params are the classic PROJ
# epsg-file values; 2757x are the "carto" variants whose false northing
# prepends the zone digit.
_NTF_LAMBERT = (
    (27561, "Lambert Nord France", 49.5, 0.999877340, 200000.0),
    (27562, "Lambert Centre France", 46.8, 0.99987742, 200000.0),
    (27563, "Lambert Sud France", 44.1, 0.999877499, 200000.0),
    (27571, "Lambert zone I", 49.5, 0.999877340, 1200000.0),
    (27572, "Lambert zone II", 46.8, 0.99987742, 2200000.0),
    (27573, "Lambert zone III", 44.1, 0.999877499, 3200000.0),
)
for _c, _n, _l0, _k, _y0 in _NTF_LAMBERT:
    _PROJECTED[_c] = (
        f"NTF (Paris) / {_n}", "NTF",
        dict(proj="lcc", lat_0=_l0, lat_1=_l0, k_0=_k, lon_0=0,
             x_0=600000.0, y_0=_y0, pm="paris"), "enu", 1.0)

def _ftus(meters: float) -> float:
    """EPSG ftUS false easting/northing in meters, reproducing the
    registry's 3-decimal ftUS rounding (e.g. 300000 m -> 984250.000
    ftUS -> 300000.0000000001 m, matching PROJ's +x_0 for EPSG:2263)."""
    return round(meters / US_FT, 3) * US_FT


# ftUS twins of the TX/NY/FL zones (EPSG 2275-2279, 2260-2262,
# 2236-2238): identical projection, false origin restated in ftUS
for _src, _dst in ((32137, 2275), (32138, 2276), (32139, 2277),
                   (32140, 2278), (32141, 2279), (32115, 2260),
                   (32116, 2261), (32117, 2262), (26958, 2236),
                   (26959, 2237), (26960, 2238)):
    _name, _datum, _p, _ax, _tm = _PROJECTED[_src]
    _pf = dict(_p, x_0=_ftus(_p["x_0"]), y_0=_ftus(_p["y_0"]))
    _PROJECTED[_dst] = (f"{_name} (ftUS)", "NAD83", _pf, "enu", US_FT)


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
        params = dict(params)
        # projected CRSs on a non-Greenwich meridian (NTF Paris Lambert
        # zones) name it via a "pm" param; lon_0 is relative to it
        pm = PRIME_MERIDIANS[params.pop("pm")] if "pm" in params else 0.0
        return dict(kind="projected", code=code, name=name, datum=datum,
                    ellps=ellps, towgs84=towgs84, axis=axis,
                    proj_params=params, to_meter=to_meter,
                    deprecated=dep, pm=pm)
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


# --------------------------------------------------------- non-EPSG
# Non-EPSG authority namespaces (reference pyproj/database.pyx:54-79
# lists EPSG, ESRI, IGNF, OGC, PROJ from proj.db). Each entry is
# either a full record tuple in the _PROJECTED/_GEOG shape, or an
# int EPSG alias. ESRI parameters are the published Esri
# projection-engine well-known definitions; IGNF entries alias the
# registry CRSs they are numerically identical to.
_ESRI = {
    # Esri continental Albers family (NAD83 / GRS80)
    "102001": ("Canada_Albers_Equal_Area_Conic", "NAD83",
               dict(proj="aea", lat_1=50, lat_2=70, lat_0=40, lon_0=-96,
                    x_0=0, y_0=0), "enu", 1.0),
    "102003": ("USA_Contiguous_Albers_Equal_Area_Conic", "NAD83",
               dict(proj="aea", lat_1=29.5, lat_2=45.5, lat_0=37.5,
                    lon_0=-96, x_0=0, y_0=0), "enu", 1.0),
    "102008": ("North_America_Albers_Equal_Area_Conic", "NAD83",
               dict(proj="aea", lat_1=20, lat_2=60, lat_0=40, lon_0=-96,
                    x_0=0, y_0=0), "enu", 1.0),
    # Esri world projections on WGS84
    "54004": ("World_Mercator", "WGS84",
              dict(proj="merc", lon_0=0, k_0=1, x_0=0, y_0=0),
              "enu", 1.0),
    "54032": ("World_Azimuthal_Equidistant", "WGS84",
              dict(proj="aeqd", lat_0=0, lon_0=0, x_0=0, y_0=0),
              "enu", 1.0),
    "54034": ("World_Cylindrical_Equal_Area", "WGS84",
              dict(proj="cea", lat_ts=0, lon_0=0, x_0=0, y_0=0),
              "enu", 1.0),
    "54009": ("World_Mollweide", "WGS84",
              dict(proj="moll", lon_0=0, x_0=0, y_0=0), "enu", 1.0),
    "54003": ("World_Miller_Cylindrical", "WGS84",
              dict(proj="mill", lon_0=0, x_0=0, y_0=0), "enu", 1.0),
    # Esri's legacy Web-Mercator codes — numeric aliases of EPSG:3857
    "102100": 3857,
    "102113": 3857,
}

_IGNF = {
    "LAMB93": 2154,    # RGF93 / Lambert-93
    "RGF93G": 4171,    # RGF93 geographic (IGNF axis order is lon/lat)
    "WGS84G": 4326,    # WGS84 geographic (lon/lat)
    "UTM31WGS84": 32631,
}

_ESRI["54008"] = ("World_Sinusoidal", "WGS84",
                  dict(proj="sinu", lon_0=0, x_0=0, y_0=0), "enu", 1.0)
# Lambert II étendu — the pre-RGF93 all-France default (alias of 27572)
_IGNF["LAMBE"] = 27572
# the classic NTF (Paris) zone ladder: LAMB1-3 and the "carto" twins
_IGNF.update({"LAMB1": 27561, "LAMB2": 27562, "LAMB3": 27563,
              "LAMB1C": 27571, "LAMB2C": 27572, "LAMB3C": 27573,
              "NTFG": 4275, "NTFP": 4807})


AUTHORITY_NAMES = ("EPSG", "ESRI", "IGNF", "OGC")


def authority_entry(auth: str, code) -> dict:
    """Resolve a non-EPSG (authority, code) to a catalog record.

    IGNF aliases resolve to their EPSG twins but keep IGNF's
    lon/lat ("enu") axis convention for geographic CRSs; the record's
    ``code`` is cleared so ``to_epsg`` reports the match through
    identification confidence, not authority identity (reference
    pyproj/crs/crs.py:1300-1340)."""
    from pyproj_spark.exceptions import CRSError
    auth = str(auth).upper()
    key = str(code).upper()
    if auth == "ESRI":
        if key not in _ESRI:
            raise CRSError(f"ESRI:{code} is not in the bundled catalog")
        if isinstance(_ESRI[key], int):  # numeric alias of an EPSG CRS
            rec = epsg_entry(_ESRI[key])
            rec.update(code=None)
            return rec
        name, datum, params, axis, to_meter = _ESRI[key]
        ellps, towgs84 = DATUMS[datum]
        return dict(kind="projected", code=None, name=name, datum=datum,
                    ellps=ellps, towgs84=towgs84, axis=axis,
                    proj_params=dict(params), to_meter=to_meter,
                    deprecated=False)
    if auth == "IGNF":
        if key not in _IGNF:
            raise CRSError(f"IGNF:{code} is not in the bundled catalog")
        rec = epsg_entry(_IGNF[key])
        rec.update(code=None, axis="enu" if rec["kind"] == "geographic"
                   else rec["axis"])
        return rec
    raise CRSError(f"unsupported authority {auth!r}")


def authority_codes(auth: str) -> list:
    """Code strings bundled for a non-EPSG authority."""
    auth = str(auth).upper()
    if auth == "ESRI":
        return sorted(_ESRI)
    if auth == "IGNF":
        return sorted(_IGNF)
    if auth == "OGC":
        return ["CRS84"]
    return []
