"""CRS layer: EPSG-subset catalog, proj-string parsing, CRS objects.

Driver-side metadata only (SURVEY.md §1.2): a CRS is an immutable,
picklable spec broadcast to executors; the parameter catalog replaces
PROJ's proj.db SQLite database with a bundled python table, queryable
through the DataFrame API (pyproj_spark.catalog_api).
"""

from pyproj_spark.crs.crs import CRS

__all__ = ["CRS"]
