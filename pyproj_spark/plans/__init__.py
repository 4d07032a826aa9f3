"""Driver-side planning: CRS pair -> TransformSpec (broadcastable)."""

from pyproj_spark.plans.spec import Transformer, TransformSpec

__all__ = ["Transformer", "TransformSpec"]
