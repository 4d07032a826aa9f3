"""Area-of-interest / bounding-box types (reference ``pyproj/aoi.py``).

AreaOfInterest: frozen dataclass with NaN rejection (aoi.py:11-47);
BBox with intersects/contains predicates (aoi.py:75-139). The same
predicates exist as native Column expressions for DataFrame filters.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class AreaOfInterest:
    west_lon_degree: float
    south_lat_degree: float
    east_lon_degree: float
    north_lat_degree: float

    def __post_init__(self):
        for v in (self.west_lon_degree, self.south_lat_degree,
                  self.east_lon_degree, self.north_lat_degree):
            if v is None or math.isnan(v):
                raise ValueError("NaN or None in AreaOfInterest")


class AreaOfUse(NamedTuple):
    """Area of use of a CRS / operation / transformer — reference
    pyproj/aoi.py:41-75 (NamedTuple with .bounds)."""

    west: float
    south: float
    east: float
    north: float
    name: str | None = None

    @property
    def bounds(self) -> tuple:
        return (self.west, self.south, self.east, self.north)

    def __str__(self) -> str:
        return f"- name: {self.name}\n- bounds: {self.bounds}"


@dataclass
class BBox:
    west: float
    south: float
    east: float
    north: float

    def intersects(self, other: "BBox") -> bool:
        # reference pyproj/aoi.py:103-120
        return (self.west < other.east and other.west < self.east
                and self.south < other.north and other.south < self.north)

    def contains(self, other: "BBox") -> bool:
        # reference pyproj/aoi.py:122-139
        return (other.west >= self.west and other.east <= self.east
                and other.south >= self.south and other.north <= self.north)


def bbox_contains_point(b: BBox, lon: Column, lat: Column) -> Column:
    """Native filter: point within bbox."""
    return ((lon >= F.lit(b.west)) & (lon <= F.lit(b.east))
            & (lat >= F.lit(b.south)) & (lat <= F.lit(b.north)))


def bbox_intersects(b: BBox, west: Column, south: Column, east: Column,
                    north: Column) -> Column:
    """Native filter: bbox columns intersect the given bbox."""
    return ((F.lit(b.west) < east) & (west < F.lit(b.east))
            & (F.lit(b.south) < north) & (south < F.lit(b.north)))
