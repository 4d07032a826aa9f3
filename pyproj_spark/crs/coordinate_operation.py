"""Typed coordinate-operation builders (reference
``pyproj/crs/coordinate_operation.py:17-1595``): each class builds the
PROJJSON "Conversion" dict for one EPSG method, which
:class:`pyproj_spark.crs.builders.ProjectedCRS` composes into a full
CRS. Keyword names and defaults mirror the reference classes.
"""

from __future__ import annotations

_SCHEMA = "https://proj.org/schemas/v0.7/projjson.schema.json"

#: (PROJJSON param name, EPSG code, unit)
_P = {
    "lat_0": ("Latitude of natural origin", 8801, "degree"),
    "lon_0": ("Longitude of natural origin", 8802, "degree"),
    "k_0": ("Scale factor at natural origin", 8805, "unity"),
    "x_0": ("False easting", 8806, "metre"),
    "y_0": ("False northing", 8807, "metre"),
    "lat_fo": ("Latitude of false origin", 8821, "degree"),
    "lon_fo": ("Longitude of false origin", 8822, "degree"),
    "x_fo": ("Easting at false origin", 8826, "metre"),
    "y_fo": ("Northing at false origin", 8827, "metre"),
    "lat_1": ("Latitude of 1st standard parallel", 8823, "degree"),
    "lat_2": ("Latitude of 2nd standard parallel", 8824, "degree"),
    "lat_ts": ("Latitude of standard parallel", 8832, "degree"),
    "lon_origin": ("Longitude of origin", 8833, "degree"),
    "lat_pc": ("Latitude of projection centre", 8811, "degree"),
    "lon_pc": ("Longitude of projection centre", 8812, "degree"),
    "alpha": ("Azimuth at projection centre", 8813, "degree"),
    "gamma": ("Angle from Rectified to Skew Grid", 8814, "degree"),
    "k_pc": ("Scale factor at projection centre", 8815, "unity"),
    "x_pc": ("Easting at projection centre", 8816, "metre"),
    "y_pc": ("Northing at projection centre", 8817, "metre"),
    "h": ("Viewpoint height", 0, "metre"),
}


def _param(key: str, value: float) -> dict:
    name, code, unit = _P[key]
    out = {"name": name, "value": float(value), "unit": unit}
    if code:
        out["id"] = {"authority": "EPSG", "code": code}
    return out


class CoordinateOperation:
    """A conversion as its PROJJSON dict (reference returns PROJ-backed
    objects; here the dict IS the operation — from_json_dict consumes
    it)."""

    def __init__(self, json_dict: dict):
        self._json = json_dict

    @classmethod
    def from_json_dict(cls, d: dict) -> "CoordinateOperation":
        return cls(d)

    @classmethod
    def from_user_input(cls, value) -> "CoordinateOperation":
        if isinstance(value, CoordinateOperation):
            return value
        if isinstance(value, dict):
            return cls(value)
        raise ValueError(f"cannot interpret conversion input {value!r}")

    def to_json_dict(self) -> dict:
        return self._json

    @property
    def name(self) -> str:
        return self._json.get("name", "unknown")

    @property
    def method_name(self) -> str:
        return self._json.get("method", {}).get("name", "unknown")

    @property
    def params(self) -> list:
        return self._json.get("parameters", [])

    def __repr__(self):
        return f"<CoordinateOperation: {self.method_name}>"


def _conversion(method: str, code: int, params: list,
                name: str = "unknown") -> CoordinateOperation:
    method_json = {"name": method}
    if code:
        method_json["id"] = {"authority": "EPSG", "code": code}
    return CoordinateOperation({
        "$schema": _SCHEMA, "type": "Conversion", "name": name,
        "method": method_json, "parameters": params})


class TransverseMercatorConversion(CoordinateOperation):
    def __new__(cls, latitude_natural_origin: float = 0.0,
                longitude_natural_origin: float = 0.0,
                false_easting: float = 0.0, false_northing: float = 0.0,
                scale_factor_natural_origin: float = 1.0):
        return _conversion("Transverse Mercator", 9807, [
            _param("lat_0", latitude_natural_origin),
            _param("lon_0", longitude_natural_origin),
            _param("k_0", scale_factor_natural_origin),
            _param("x_0", false_easting),
            _param("y_0", false_northing)])


class UTMConversion(CoordinateOperation):
    def __new__(cls, zone: int, hemisphere: str = "N"):
        south = str(hemisphere).upper() == "S"
        return _conversion(
            "Transverse Mercator", 9807, [
                _param("lat_0", 0.0),
                _param("lon_0", int(zone) * 6 - 183),
                _param("k_0", 0.9996),
                _param("x_0", 500000.0),
                _param("y_0", 10000000.0 if south else 0.0)],
            name=f"UTM zone {int(zone)}{'S' if south else 'N'}")


class MercatorAConversion(CoordinateOperation):
    def __new__(cls, latitude_natural_origin: float = 0.0,
                longitude_natural_origin: float = 0.0,
                false_easting: float = 0.0, false_northing: float = 0.0,
                scale_factor_natural_origin: float = 1.0):
        if latitude_natural_origin != 0.0:
            raise ValueError("lat_0 must be 0 for Mercator (variant A)")
        return _conversion("Mercator (variant A)", 9804, [
            _param("lat_0", 0.0),
            _param("lon_0", longitude_natural_origin),
            _param("k_0", scale_factor_natural_origin),
            _param("x_0", false_easting),
            _param("y_0", false_northing)])


class MercatorBConversion(CoordinateOperation):
    def __new__(cls, latitude_first_parallel: float = 0.0,
                longitude_natural_origin: float = 0.0,
                false_easting: float = 0.0, false_northing: float = 0.0):
        return _conversion("Mercator (variant B)", 9805, [
            _param("lat_1", latitude_first_parallel),
            _param("lon_0", longitude_natural_origin),
            _param("x_0", false_easting),
            _param("y_0", false_northing)])


class LambertConformalConic2SPConversion(CoordinateOperation):
    def __new__(cls, latitude_false_origin: float = 0.0,
                longitude_false_origin: float = 0.0,
                latitude_first_parallel: float = 0.0,
                latitude_second_parallel: float = 0.0,
                easting_false_origin: float = 0.0,
                northing_false_origin: float = 0.0):
        return _conversion("Lambert Conic Conformal (2SP)", 9802, [
            _param("lat_fo", latitude_false_origin),
            _param("lon_fo", longitude_false_origin),
            _param("lat_1", latitude_first_parallel),
            _param("lat_2", latitude_second_parallel),
            _param("x_fo", easting_false_origin),
            _param("y_fo", northing_false_origin)])


class LambertConformalConic1SPConversion(CoordinateOperation):
    def __new__(cls, latitude_natural_origin: float = 0.0,
                longitude_natural_origin: float = 0.0,
                false_easting: float = 0.0, false_northing: float = 0.0,
                scale_factor_natural_origin: float = 1.0):
        return _conversion("Lambert Conic Conformal (1SP)", 9801, [
            _param("lat_0", latitude_natural_origin),
            _param("lon_0", longitude_natural_origin),
            _param("k_0", scale_factor_natural_origin),
            _param("x_0", false_easting),
            _param("y_0", false_northing)])


class LambertAzimuthalEqualAreaConversion(CoordinateOperation):
    def __new__(cls, latitude_natural_origin: float = 0.0,
                longitude_natural_origin: float = 0.0,
                false_easting: float = 0.0, false_northing: float = 0.0):
        return _conversion("Lambert Azimuthal Equal Area", 9820, [
            _param("lat_0", latitude_natural_origin),
            _param("lon_0", longitude_natural_origin),
            _param("x_0", false_easting),
            _param("y_0", false_northing)])


class LambertCylindricalEqualAreaConversion(CoordinateOperation):
    def __new__(cls, latitude_first_parallel: float = 0.0,
                longitude_natural_origin: float = 0.0,
                false_easting: float = 0.0, false_northing: float = 0.0):
        return _conversion("Lambert Cylindrical Equal Area", 9835, [
            _param("lat_1", latitude_first_parallel),
            _param("lon_0", longitude_natural_origin),
            _param("x_0", false_easting),
            _param("y_0", false_northing)])


class LambertCylindricalEqualAreaScaleConversion(CoordinateOperation):
    def __new__(cls, longitude_natural_origin: float = 0.0,
                false_easting: float = 0.0, false_northing: float = 0.0,
                scale_factor_natural_origin: float = 1.0):
        # reference converts k_0 -> equivalent lat_ts via PROJ; here the
        # kernel accepts k_0 directly (kernels/projections.py cea)
        import math
        lat_ts = math.degrees(math.acos(
            min(1.0, float(scale_factor_natural_origin))))
        return _conversion("Lambert Cylindrical Equal Area", 9835, [
            _param("lat_1", lat_ts),
            _param("lon_0", longitude_natural_origin),
            _param("x_0", false_easting),
            _param("y_0", false_northing)])


class AzimuthalEquidistantConversion(CoordinateOperation):
    def __new__(cls, latitude_natural_origin: float = 0.0,
                longitude_natural_origin: float = 0.0,
                false_easting: float = 0.0, false_northing: float = 0.0):
        return _conversion("Modified Azimuthal Equidistant", 9832, [
            _param("lat_0", latitude_natural_origin),
            _param("lon_0", longitude_natural_origin),
            _param("x_0", false_easting),
            _param("y_0", false_northing)])


class PolarStereographicAConversion(CoordinateOperation):
    def __new__(cls, latitude_natural_origin: float = 90.0,
                longitude_natural_origin: float = 0.0,
                false_easting: float = 0.0, false_northing: float = 0.0,
                scale_factor_natural_origin: float = 1.0):
        if abs(latitude_natural_origin) != 90.0:
            raise ValueError("lat_0 must be +/-90 for Polar "
                             "Stereographic (variant A)")
        return _conversion("Polar Stereographic (variant A)", 9810, [
            _param("lat_0", latitude_natural_origin),
            _param("lon_0", longitude_natural_origin),
            _param("k_0", scale_factor_natural_origin),
            _param("x_0", false_easting),
            _param("y_0", false_northing)])


class PolarStereographicBConversion(CoordinateOperation):
    def __new__(cls, latitude_standard_parallel: float = 0.0,
                longitude_origin: float = 0.0,
                false_easting: float = 0.0, false_northing: float = 0.0):
        lat_0 = 90.0 if latitude_standard_parallel >= 0 else -90.0
        return CoordinateOperation({
            "$schema": _SCHEMA, "type": "Conversion", "name": "unknown",
            "method": {"name": "Polar Stereographic (variant B)",
                       "id": {"authority": "EPSG", "code": 9829}},
            "parameters": [
                _param("lat_ts", latitude_standard_parallel),
                _param("lon_origin", longitude_origin),
                _param("lat_0", lat_0),
                _param("x_0", false_easting),
                _param("y_0", false_northing)]})


class StereographicConversion(CoordinateOperation):
    def __new__(cls, latitude_natural_origin: float = 0.0,
                longitude_natural_origin: float = 0.0,
                false_easting: float = 0.0, false_northing: float = 0.0,
                scale_factor_natural_origin: float = 1.0):
        return _conversion("Stereographic", 0, [
            _param("lat_0", latitude_natural_origin),
            _param("lon_0", longitude_natural_origin),
            _param("k_0", scale_factor_natural_origin),
            _param("x_0", false_easting),
            _param("y_0", false_northing)])


class EquidistantCylindricalConversion(CoordinateOperation):
    def __new__(cls, latitude_first_parallel: float = 0.0,
                latitude_natural_origin: float = 0.0,
                longitude_natural_origin: float = 0.0,
                false_easting: float = 0.0, false_northing: float = 0.0):
        return _conversion("Equidistant Cylindrical", 1028, [
            _param("lat_ts", latitude_first_parallel),
            _param("lat_0", latitude_natural_origin),
            _param("lon_0", longitude_natural_origin),
            _param("x_0", false_easting),
            _param("y_0", false_northing)])


#: reference alias (coordinate_operation.py:1589-1592)
PlateCarreeConversion = EquidistantCylindricalConversion


class SinusoidalConversion(CoordinateOperation):
    def __new__(cls, longitude_natural_origin: float = 0.0,
                false_easting: float = 0.0, false_northing: float = 0.0):
        return _conversion("Sinusoidal", 0, [
            _param("lon_0", longitude_natural_origin),
            _param("x_0", false_easting),
            _param("y_0", false_northing)])


class GeostationarySatelliteConversion(CoordinateOperation):
    def __new__(cls, sweep_angle_axis: str, satellite_height: float,
                latitude_natural_origin: float = 0.0,
                longitude_natural_origin: float = 0.0,
                false_easting: float = 0.0, false_northing: float = 0.0):
        sweep = str(sweep_angle_axis).lower()
        if sweep not in ("x", "y"):
            raise ValueError("sweep_angle_axis must be 'x' or 'y'")
        if latitude_natural_origin != 0.0:
            raise ValueError("lat_0 must be 0 for geostationary view")
        return _conversion(
            f"Geostationary Satellite (Sweep {sweep.upper()})", 0, [
                _param("h", satellite_height),
                _param("lon_0", longitude_natural_origin),
                _param("x_0", false_easting),
                _param("y_0", false_northing)])


class AlbersEqualAreaConversion(CoordinateOperation):
    def __new__(cls, latitude_first_parallel: float,
                latitude_second_parallel: float,
                latitude_false_origin: float = 0.0,
                longitude_false_origin: float = 0.0,
                easting_false_origin: float = 0.0,
                northing_false_origin: float = 0.0):
        return _conversion("Albers Equal Area", 9822, [
            _param("lat_fo", latitude_false_origin),
            _param("lon_fo", longitude_false_origin),
            _param("lat_1", latitude_first_parallel),
            _param("lat_2", latitude_second_parallel),
            _param("x_fo", easting_false_origin),
            _param("y_fo", northing_false_origin)])


class OrthographicConversion(CoordinateOperation):
    def __new__(cls, latitude_natural_origin: float = 0.0,
                longitude_natural_origin: float = 0.0,
                false_easting: float = 0.0, false_northing: float = 0.0):
        return _conversion("Orthographic", 9840, [
            _param("lat_0", latitude_natural_origin),
            _param("lon_0", longitude_natural_origin),
            _param("x_0", false_easting),
            _param("y_0", false_northing)])


class VerticalPerspectiveConversion(CoordinateOperation):
    def __new__(cls, viewpoint_height: float,
                latitude_topocentric_origin: float = 0.0,
                longitude_topocentric_origin: float = 0.0,
                ellipsoidal_height_topocentric_origin: float = 0.0,
                false_easting: float = 0.0, false_northing: float = 0.0):
        return _conversion("Vertical Perspective", 9838, [
            _param("lat_0", latitude_topocentric_origin),
            _param("lon_0", longitude_topocentric_origin),
            _param("h", viewpoint_height),
            _param("x_0", false_easting),
            _param("y_0", false_northing)])


class HotineObliqueMercatorBConversion(CoordinateOperation):
    def __new__(cls, latitude_projection_centre: float,
                longitude_projection_centre: float,
                azimuth_projection_centre: float,
                angle_from_rectified_to_skew_grid: float,
                scale_factor_projection_centre: float = 1.0,
                easting_projection_centre: float = 0.0,
                northing_projection_centre: float = 0.0):
        return _conversion("Hotine Oblique Mercator (variant B)", 9815, [
            _param("lat_pc", latitude_projection_centre),
            _param("lon_pc", longitude_projection_centre),
            _param("alpha", azimuth_projection_centre),
            _param("gamma", angle_from_rectified_to_skew_grid),
            _param("k_pc", scale_factor_projection_centre),
            _param("x_pc", easting_projection_centre),
            _param("y_pc", northing_projection_centre)])


class PolyconicConversion(CoordinateOperation):
    def __new__(cls, latitude_natural_origin: float = 0.0,
                longitude_natural_origin: float = 0.0,
                false_easting: float = 0.0, false_northing: float = 0.0):
        return _conversion("American Polyconic", 9818, [
            _param("lat_0", latitude_natural_origin),
            _param("lon_0", longitude_natural_origin),
            _param("x_0", false_easting),
            _param("y_0", false_northing)])


class RotatedLatitudeLongitudeConversion(CoordinateOperation):
    def __new__(cls, o_lat_p: float, o_lon_p: float, lon_0: float = 0.0):
        return CoordinateOperation({
            "$schema": _SCHEMA, "type": "Conversion", "name": "unknown",
            "method": {"name": "PROJ ob_tran o_proj=longlat"},
            "parameters": [
                {"name": "o_lat_p", "value": float(o_lat_p),
                 "unit": "degree"},
                {"name": "o_lon_p", "value": float(o_lon_p),
                 "unit": "degree"},
                {"name": "lon_0", "value": float(lon_0),
                 "unit": "degree"}]})


#: reference coordinate_operation.py:1461-1513 — same rotation, CF
#: netCDF parameter names
class PoleRotationNetCDFCFConversion(CoordinateOperation):
    def __new__(cls, grid_north_pole_latitude: float,
                grid_north_pole_longitude: float,
                north_pole_grid_longitude: float = 0.0):
        return RotatedLatitudeLongitudeConversion(
            o_lat_p=grid_north_pole_latitude,
            o_lon_p=north_pole_grid_longitude,
            lon_0=grid_north_pole_longitude + 180.0)


class ToWGS84Transformation(CoordinateOperation):
    def __new__(cls, source_crs, x_axis_translation: float = 0.0,
                y_axis_translation: float = 0.0,
                z_axis_translation: float = 0.0,
                x_axis_rotation: float = 0.0,
                y_axis_rotation: float = 0.0,
                z_axis_rotation: float = 0.0,
                scale_difference: float = 0.0):
        pnames = ["X-axis translation", "Y-axis translation",
                  "Z-axis translation", "X-axis rotation",
                  "Y-axis rotation", "Z-axis rotation",
                  "Scale difference"]
        vals = [x_axis_translation, y_axis_translation,
                z_axis_translation, x_axis_rotation, y_axis_rotation,
                z_axis_rotation, scale_difference]
        return CoordinateOperation({
            "$schema": _SCHEMA, "type": "Transformation",
            "name": "Transformation from unknown to WGS84",
            "method": {"name": "Position Vector transformation "
                               "(geog2D domain)",
                       "id": {"authority": "EPSG", "code": 9606}},
            "parameters": [{"name": n, "value": float(v)}
                           for n, v in zip(pnames, vals)]})
