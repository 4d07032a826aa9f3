"""pyproj_spark — a from-scratch PySpark-native geospatial engine.

Re-expresses the query surface of pyproj4/pyproj (CRS-to-CRS transforms,
proj-string/EPSG parsing, datum shift, Karney geodesics) as:

* pure numpy kernels (``pyproj_spark.kernels``) — vectorized, no per-row
  Python, testable without a SparkSession;
* a driver-side planner (``pyproj_spark.plans``) that resolves CRS pairs
  into a broadcastable :class:`TransformSpec` (the Spark analogue of
  ``pyproj.Transformer.from_crs`` — reference
  ``pyproj/transformer.py:667-752``);
* Spark-facing column functions (``pyproj_spark.functions``) — scalar
  pandas/Arrow UDFs for the iterative kernels, native Catalyst
  expressions everywhere the math is closed-form (cell ids, tiles,
  bboxes, reverse_azimuth);
* DataFrame-composed spatial operators (``pyproj_spark.operators``) —
  point-in-polygon join, kNN via cell-ring expansion, transform_bounds,
  tiling, plus the web-scale text ops (dedup / similarity / quality).

Nothing in here links against PROJ; all math is reimplemented from
public formulas (Snyder 1987, Karney 2013, Poder & Engsager 1998).
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy top-level API to keep kernel imports Spark-free
    if name == "CRS":
        from pyproj_spark.crs.crs import CRS
        return CRS
    if name in ("Transformer", "TransformSpec"):
        from pyproj_spark.plans import spec
        return getattr(spec, name)
    if name == "Geodesic":
        from pyproj_spark.kernels.geodesic import Geodesic
        return Geodesic
    raise AttributeError(name)
