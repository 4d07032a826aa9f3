"""WKT2:2019 emitter (reference ``pyproj/_crs.pyx:93-102`` to_wkt with
6 dialects; the engine emits WKT2_2019 only). The matching parser —
which also reads WKT1-GDAL and PROJ's ENSEMBLE-style WKT2 — lives in
``wkt_parse.py``; the two share these method/parameter tables via the
parser's inverse maps."""

from __future__ import annotations

_METHOD_NAMES = {
    "tmerc": ("Transverse Mercator", 9807),
    "etmerc": ("Transverse Mercator", 9807),
    "utm": ("Transverse Mercator", 9807),
    "merc": ("Mercator (variant B)", 9805),
    "webmerc": ("Popular Visualisation Pseudo Mercator", 1024),
    "lcc": ("Lambert Conic Conformal (2SP)", 9802),
    "laea": ("Lambert Azimuthal Equal Area", 9820),
    "aeqd": ("Modified Azimuthal Equidistant", 9832),
    "stere": ("Polar Stereographic (variant B)", 9829),
    "sterea": ("Oblique Stereographic", 9809),
    "eqc": ("Equidistant Cylindrical", 1028),
    "sinu": ("Sinusoidal", 0),
    "geos": ("Geostationary Satellite (Sweep Y)", 0),
    "aea": ("Albers Equal Area", 9822),
    "cea": ("Lambert Cylindrical Equal Area", 9835),
    "omerc": ("Hotine Oblique Mercator (variant B)", 9815),
    "ortho": ("Orthographic", 9840),
    "nsper": ("Vertical Perspective", 9838),
    "poly": ("American Polyconic", 9818),
    # EPSG models LV03/LV95 via 9815 with azimuth=90; we emit the
    # distinct name (code 0) so parse returns the somerc kernel, not
    # the Hotine variant-B one (sinu/geos precedent for code 0)
    "somerc": ("Swiss Oblique Mercator", 0),
    "moll": ("Mollweide", 0),
    "mill": ("Miller Cylindrical", 0),
    "gnom": ("Gnomonic", 0),
    "cass": ("Cassini-Soldner", 9806),
    "krovak": ("Krovak", 9819),
    "eqearth": ("Equal Earth", 1078),
    "bonne": ("Bonne", 9827),
    "vandg": ("Van Der Grinten", 0),
    "wintri": ("Winkel Tripel", 0),
    "hammer": ("Hammer Aitoff", 0),
    "aitoff": ("Aitoff", 0),
}

_PARAM_NAMES = {
    "lat_0": ("Latitude of natural origin", 8801, "angleunit"),
    "lon_0": ("Longitude of natural origin", 8802, "angleunit"),
    "k_0": ("Scale factor at natural origin", 8805, "scaleunit"),
    "k": ("Scale factor at natural origin", 8805, "scaleunit"),
    "x_0": ("False easting", 8806, "lengthunit"),
    "y_0": ("False northing", 8807, "lengthunit"),
    "lat_1": ("Latitude of 1st standard parallel", 8823, "angleunit"),
    "lat_2": ("Latitude of 2nd standard parallel", 8824, "angleunit"),
    "lat_ts": ("Latitude of standard parallel", 8832, "angleunit"),
    "h": ("Satellite height", 0, "lengthunit"),
    "lonc": ("Longitude of projection centre", 8812, "angleunit"),
    "alpha": ("Azimuth at projection centre", 8813, "angleunit"),
    "gamma": ("Angle from Rectified to Skew Grid", 8814, "angleunit"),
}


def _q(s: str) -> str:
    return '"' + str(s).replace('"', "'") + '"'


def _datum_wkt(crs) -> str:
    e = crs.ellipsoid
    inv_f = e.rf
    out = (f'DATUM[{_q(crs.datum_name or "unknown")},'
           f'ELLIPSOID[{_q(e.name)},{e.a!r},{inv_f!r},'
           f'LENGTHUNIT["metre",1]]]')
    pm = getattr(crs, "pm", 0.0)
    if pm:
        from pyproj_spark.crs.catalog import PRIME_MERIDIANS
        name = next((k.capitalize() for k, v in PRIME_MERIDIANS.items()
                     if v == pm), "unknown")
        out += (f',PRIMEM[{_q(name)},{pm!r},'
                'ANGLEUNIT["degree",0.0174532925199433]]')
    return out


def _geog_cs(n_dim: int = 2) -> str:
    if n_dim == 3:
        # mixed units: per-axis units (WKT2 3D ellipsoidal CS shape)
        ang = 'ANGLEUNIT["degree",0.0174532925199433]'
        return ('CS[ellipsoidal,3],'
                f'AXIS["geodetic latitude (Lat)",north,{ang}],'
                f'AXIS["geodetic longitude (Lon)",east,{ang}],'
                'AXIS["ellipsoidal height (h)",up,'
                'LENGTHUNIT["metre",1]]')
    return ('CS[ellipsoidal,2],'
            'AXIS["geodetic latitude (Lat)",north],'
            'AXIS["geodetic longitude (Lon)",east],'
            'ANGLEUNIT["degree",0.0174532925199433]')


def to_wkt(crs, pretty: bool = False) -> str:
    """WKT2:2019 string for a CRS built by this engine.

    A CRS whose towgs84 is not derivable from its datum name (datumless
    proj-string CRSs, or an explicit override) is wrapped in BOUNDCRS
    with an ABRIDGEDTRANSFORMATION carrying the shift — the same shape
    PROJ emits, and what from_wkt reads back (wkt_parse.py BOUNDCRS)."""
    body = _crs_body_wkt(crs)
    from pyproj_spark.crs.catalog import DATUMS
    tw = crs.towgs84
    derivable = (crs.datum_name in DATUMS
                 and tuple(DATUMS[crs.datum_name][1] or ()) == tuple(tw or ()))
    if tw is not None and not derivable:
        names3 = ["X-axis translation", "Y-axis translation",
                  "Z-axis translation"]
        names7 = names3 + ["X-axis rotation", "Y-axis rotation",
                           "Z-axis rotation", "Scale difference"]
        names = names3 if len(tw) == 3 else names7
        plist = ",".join(
            f'PARAMETER[{_q(n)},{float(v)!r}]'
            for n, v in zip(names, tw))
        method = ("Geocentric translations (geog2D domain)"
                  if len(tw) == 3 else
                  "Position Vector transformation (geog2D domain)")
        mcode = 9603 if len(tw) == 3 else 9606
        target = ('GEOGCRS["WGS 84",DATUM["WGS84",'
                  'ELLIPSOID["WGS84",6378137.0,298.257223563,'
                  'LENGTHUNIT["metre",1]]],'
                  + _geog_cs() + ',ID["EPSG",4326]]')
        body = (f'BOUNDCRS[SOURCECRS[{body}],TARGETCRS[{target}],'
                f'ABRIDGEDTRANSFORMATION['
                f'{_q("Transformation to WGS84")},'
                f'METHOD[{_q(method)},ID["EPSG",{mcode}]],{plist}]]')
    if pretty:
        body = _prettify(body)
    return body


def _crs_body_wkt(crs) -> str:
    if crs.is_geographic:
        wkt = (f'GEOGCRS[{_q(crs.name)},{_datum_wkt(crs)},'
               f'{_geog_cs(getattr(crs, "n_dim", 2))}'
               + (f',ID["EPSG",{crs.epsg_code}]' if crs.epsg_code else "")
               + "]")
    elif crs.is_geocentric:
        wkt = (f'GEODCRS[{_q(crs.name)},{_datum_wkt(crs)},'
               'CS[Cartesian,3],'
               'AXIS["(X)",geocentricX],AXIS["(Y)",geocentricY],'
               'AXIS["(Z)",geocentricZ],LENGTHUNIT["metre",1]'
               + (f',ID["EPSG",{crs.epsg_code}]' if crs.epsg_code else "")
               + "]")
    else:
        params = dict(crs.proj_params)
        proj = params.pop("proj")
        method, mcode = _METHOD_NAMES.get(proj, (proj, 0))
        if proj == "utm":
            zone = int(params.pop("zone"))
            south = bool(params.pop("south", False))
            params = {"lat_0": 0, "lon_0": zone * 6 - 183, "k_0": 0.9996,
                      "x_0": 500000, "y_0": 10000000 if south else 0}
        plist = []
        for k, v in params.items():
            if k not in _PARAM_NAMES or v is True:
                continue
            name, code, unit = _PARAM_NAMES[k]
            uwkt = ('ANGLEUNIT["degree",0.0174532925199433]'
                    if unit == "angleunit" else
                    'SCALEUNIT["unity",1]' if unit == "scaleunit" else
                    'LENGTHUNIT["metre",1]')
            idp = f',ID["EPSG",{code}]' if code else ""
            plist.append(f'PARAMETER[{_q(name)},{float(v)!r},{uwkt}{idp}]')
        u = crs.to_meter or 1.0
        unit_name = ("metre" if u == 1.0 else
                     "US survey foot" if abs(u - 0.304800609601219) < 1e-12
                     else "unknown")
        base = (f'BASEGEOGCRS[{_q((crs.datum_name or "unknown"))},'
                f'{_datum_wkt(crs)}]')
        wkt = (f'PROJCRS[{_q(crs.name)},{base},'
               f'CONVERSION[{_q(method)},METHOD[{_q(method)}'
               + (f',ID["EPSG",{mcode}]' if mcode else "") + "],"
               + ",".join(plist) + "],"
               + ('CS[Cartesian,3],'
                  'AXIS["(E)",east],AXIS["(N)",north],'
                  'AXIS["ellipsoidal height (h)",up],'
                  if getattr(crs, "n_dim", 2) == 3 else
                  'CS[Cartesian,2],'
                  'AXIS["(E)",east],AXIS["(N)",north],')
               + f'LENGTHUNIT[{_q(unit_name)},{u!r}]'
               + (f',ID["EPSG",{crs.epsg_code}]' if crs.epsg_code else "")
               + "]")
    return wkt


def _prettify(wkt: str) -> str:
    out = []
    depth = 0
    i = 0
    in_str = False
    for ch in wkt:
        if ch == '"':
            in_str = not in_str
        if not in_str and ch == "[":
            depth += 1
        elif not in_str and ch == "]":
            depth -= 1
        if not in_str and ch == "," and depth <= 2:
            out.append(",\n" + "    " * depth)
        else:
            out.append(ch)
    return "".join(out)
