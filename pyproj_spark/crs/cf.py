"""CF-1.8 grid-mapping conversion (reference ``pyproj/crs/crs.py:620-876``,
table-driven by ``pyproj/crs/_cf1x8.py`` — here a minimal table for the
projections the engine implements; names are the public CF conventions).
"""

from __future__ import annotations

# proj name -> (grid_mapping_name, {proj_param: cf_attr})
_TO_CF = {
    "longlat": ("latitude_longitude", {}),
    "tmerc": ("transverse_mercator", {
        "k_0": "scale_factor_at_central_meridian",
        "lon_0": "longitude_of_central_meridian",
        "lat_0": "latitude_of_projection_origin",
        "x_0": "false_easting", "y_0": "false_northing"}),
    "merc": ("mercator", {
        "lat_ts": "standard_parallel",
        "k_0": "scale_factor_at_projection_origin",
        "lon_0": "longitude_of_projection_origin",
        "x_0": "false_easting", "y_0": "false_northing"}),
    "webmerc": ("popular_visualisation_pseudo_mercator", {
        "lon_0": "longitude_of_projection_origin",
        "x_0": "false_easting", "y_0": "false_northing"}),
    "lcc": ("lambert_conformal_conic", {
        "lon_0": "longitude_of_central_meridian",
        "lat_0": "latitude_of_projection_origin",
        "x_0": "false_easting", "y_0": "false_northing"}),
    "laea": ("lambert_azimuthal_equal_area", {
        "lon_0": "longitude_of_projection_origin",
        "lat_0": "latitude_of_projection_origin",
        "x_0": "false_easting", "y_0": "false_northing"}),
    "aeqd": ("azimuthal_equidistant", {
        "lon_0": "longitude_of_projection_origin",
        "lat_0": "latitude_of_projection_origin",
        "x_0": "false_easting", "y_0": "false_northing"}),
    "stere": ("polar_stereographic", {
        "lon_0": "straight_vertical_longitude_from_pole",
        "lat_0": "latitude_of_projection_origin",
        "lat_ts": "standard_parallel",
        "k_0": "scale_factor_at_projection_origin",
        "x_0": "false_easting", "y_0": "false_northing"}),
    "sinu": ("sinusoidal", {
        "lon_0": "longitude_of_projection_origin",
        "x_0": "false_easting", "y_0": "false_northing"}),
    "geos": ("geostationary", {
        "h": "perspective_point_height",
        "lon_0": "longitude_of_projection_origin",
        "x_0": "false_easting", "y_0": "false_northing"}),
    "eqc": ("equirectangular", {
        "lat_ts": "standard_parallel",
        "lon_0": "longitude_of_central_meridian",
        "x_0": "false_easting", "y_0": "false_northing"}),
    "aea": ("albers_conical_equal_area", {
        "lon_0": "longitude_of_central_meridian",
        "lat_0": "latitude_of_projection_origin",
        "x_0": "false_easting", "y_0": "false_northing"}),
    "cea": ("lambert_cylindrical_equal_area", {
        "lat_ts": "standard_parallel",
        "lon_0": "longitude_of_central_meridian",
        "x_0": "false_easting", "y_0": "false_northing"}),
    "ortho": ("orthographic", {
        "lon_0": "longitude_of_projection_origin",
        "lat_0": "latitude_of_projection_origin",
        "x_0": "false_easting", "y_0": "false_northing"}),
    "nsper": ("vertical_perspective", {
        "h": "perspective_point_height",
        "lon_0": "longitude_of_projection_origin",
        "lat_0": "latitude_of_projection_origin",
        "x_0": "false_easting", "y_0": "false_northing"}),
    "omerc": ("oblique_mercator", {
        "alpha": "azimuth_of_central_line",
        "lat_0": "latitude_of_projection_origin",
        "lonc": "longitude_of_projection_origin",
        "k_0": "scale_factor_at_projection_origin",
        "x_0": "false_easting", "y_0": "false_northing"}),
    # rotated pole: attrs are derived, not table-mapped (see to_cf)
    "ob_tran": ("rotated_latitude_longitude", {}),
}

# oblique stereographic (CF "stereographic"): |lat_0| != 90 — polar_
# stereographic would mislabel it (its lon attr means the pole meridian)
_OBLIQUE_STERE = ("stereographic", {
    "lon_0": "longitude_of_projection_origin",
    "lat_0": "latitude_of_projection_origin",
    "k_0": "scale_factor_at_projection_origin",
    "x_0": "false_easting", "y_0": "false_northing"})

_FROM_CF = {gm: (proj, {cf: pk for pk, cf in table.items()})
            for proj, (gm, table) in _TO_CF.items()}
_FROM_CF["stereographic"] = (
    "stere", {cf: pk for pk, cf in _OBLIQUE_STERE[1].items()})


def to_cf(crs) -> dict:
    """CF grid-mapping dict for a CRS built by this engine."""
    e = crs.ellipsoid
    out = {
        "semi_major_axis": e.a,
        "semi_minor_axis": e.b,
        "inverse_flattening": e.rf,
        "reference_ellipsoid_name": e.name,
        "longitude_of_prime_meridian": 0.0,
        "prime_meridian_name": "Greenwich",
        "horizontal_datum_name": crs.datum_name or "unknown",
        "crs_wkt": crs.to_wkt(),
    }
    if crs.towgs84 is not None:
        out["towgs84"] = [float(v) for v in crs.towgs84]  # CF-1.8 optional
    params = dict(crs.proj_params)
    proj = params.pop("proj")
    if proj == "utm":
        zone = int(params.pop("zone"))
        south = bool(params.pop("south", False))
        params.update(lat_0=0.0, lon_0=zone * 6 - 183, k_0=0.9996,
                      x_0=500000.0, y_0=10000000.0 if south else 0.0)
        proj = "tmerc"
    if proj not in _TO_CF:
        raise ValueError(f"no CF grid mapping for +proj={proj}")
    gm, table = _TO_CF[proj]
    if proj == "stere" and abs(float(params.get("lat_0", 0.0))) != 90.0:
        gm, table = _OBLIQUE_STERE
    out["grid_mapping_name"] = gm
    for pk, cf in table.items():
        if pk in params:
            out[cf] = float(params[pk])
    if proj in ("lcc", "aea"):
        sp = [float(params[k]) for k in ("lat_1", "lat_2") if k in params]
        out["standard_parallel"] = sp[0] if len(sp) == 1 else sp
    if proj == "geos":
        out["sweep_angle_axis"] = str(crs.proj_params.get("sweep", "y"))
    if proj == "omerc":
        g = params.get("gamma")
        if g is not None and float(g) != 90.0:
            import warnings
            warnings.warn("angle from rectified to skew grid parameter "
                          "lost in conversion to CF")  # reference
            # _cf1x8.py:509-517 semantics: CF has no attribute for gamma
    if proj == "ob_tran":
        # PROJ rotated pole -> CF pole-rotation attrs (reference
        # PoleRotationNetCDFCFConversion, _cf1x8.py:336-344):
        # lon_0 = grid_north_pole_longitude + 180
        out["grid_mapping_name"] = "rotated_latitude_longitude"
        out["grid_north_pole_latitude"] = float(params.get("o_lat_p", 90.0))
        out["grid_north_pole_longitude"] = (
            float(params.get("lon_0", 0.0)) - 180.0)
        out["north_pole_grid_longitude"] = float(params.get("o_lon_p", 0.0))
    return out


def from_cf(cf: dict):
    """CF grid-mapping dict -> CRS (inverse of to_cf for supported
    mappings)."""
    from pyproj_spark.crs.crs import CRS
    gm = cf["grid_mapping_name"]
    if gm not in _FROM_CF:
        raise ValueError(f"unsupported grid_mapping_name {gm!r}")
    proj, table = _FROM_CF[gm]
    params: dict = {"proj": proj}
    for cfk, pk in table.items():
        if cfk in cf:
            params[pk] = float(cf[cfk])
    if gm in ("lambert_conformal_conic",
              "albers_conical_equal_area") and "standard_parallel" in cf:
        sp = cf["standard_parallel"]
        if isinstance(sp, (list, tuple)):
            params["lat_1"], params["lat_2"] = float(sp[0]), float(sp[1])
        else:
            params["lat_1"] = float(sp)
    if gm == "geostationary":
        params["sweep"] = str(cf.get("sweep_angle_axis", "y"))
    if gm == "oblique_mercator":
        # reference builds HotineObliqueMercatorB with angle from
        # rectified to skew grid fixed at 90 (_cf1x8.py:229-243)
        params["gamma"] = 90.0
    if gm == "rotated_latitude_longitude":
        params["o_lat_p"] = float(cf["grid_north_pole_latitude"])
        params["o_lon_p"] = float(cf.get("north_pole_grid_longitude", 0.0))
        params["lon_0"] = float(cf["grid_north_pole_longitude"]) + 180.0
    if "semi_major_axis" in cf:
        params["a"] = float(cf["semi_major_axis"])
        if cf.get("inverse_flattening"):
            params["rf"] = float(cf["inverse_flattening"])
        elif "semi_minor_axis" in cf:
            params["b"] = float(cf["semi_minor_axis"])
        else:
            params["f"] = 0.0
    # recover the datum (and thus the WGS84 path) from the CF name —
    # without it the rebuilt CRS would only support ballpark transforms
    from pyproj_spark.crs.catalog import DATUMS
    if "towgs84" in cf:
        params["towgs84"] = ",".join(str(float(v)) for v in cf["towgs84"])
    else:
        dname = cf.get("horizontal_datum_name")
        if dname in DATUMS:
            params["towgs84"] = ",".join(str(v) for v in DATUMS[dname][1])
    return CRS.from_dict(params)
