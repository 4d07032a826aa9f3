"""CRS layer: EPSG-subset catalog, proj-string parsing, CRS objects.

Driver-side metadata only (SURVEY.md §1.2): a CRS is an immutable,
picklable spec broadcast to executors; the parameter catalog replaces
PROJ's proj.db SQLite database with a bundled python table, queryable
through the DataFrame API (pyproj_spark.catalog_api).
"""

from pyproj_spark.crs.crs import CRS


def __getattr__(name):
    # lazy re-exports: builder classes (reference pyproj.crs namespace)
    _builders = {"GeographicCRS", "GeocentricCRS", "DerivedGeographicCRS",
                 "ProjectedCRS", "VerticalCRS", "CompoundCRS", "BoundCRS",
                 "Datum", "CustomDatum", "CustomEllipsoid",
                 "Ellipsoidal2DCS", "Ellipsoidal3DCS", "Cartesian2DCS",
                 "VerticalCS"}
    if name in _builders:
        from pyproj_spark.crs import builders
        return getattr(builders, name)
    if name == "coordinate_operation":
        from pyproj_spark.crs import coordinate_operation
        return coordinate_operation
    raise AttributeError(name)


__all__ = ["CRS", "GeographicCRS", "GeocentricCRS", "DerivedGeographicCRS",
           "ProjectedCRS", "VerticalCRS", "CompoundCRS", "BoundCRS"]
