"""Rhumb-line (loxodrome) navigation — constant-bearing tracks.

The navigation complement of the geodesic family (`kernels/geod.py`):
a rhumb line crosses every meridian at the same angle, which is what
ships/aircraft actually steer, at the cost of being longer than the
great circle. Spherical closed forms (Bowditch / Williams formulary)
on the repo's mean radius, as PURE Catalyst column expressions — the
whole computation stays inside whole-stage codegen, zero UDFs, and a
SQL engine can replay it term for term (see queries.py `rhumb_line`).

Inverse problem: bearing + distance between two points via the
isometric-latitude difference dpsi = ln tan(pi/4 + phi/2) |_1^2 and
the Mercator-course identity tan(theta) = dlam / dpsi; distance uses
the exact along-track integral d = R*sqrt(dphi^2 + q^2*dlam^2) with
q = dphi/dpsi (-> cos(phi) on the E-W limit where dphi = dpsi = 0).

Direct problem: destination from (point, bearing, distance) by the
same identities run forward.

Longitude differences wrap through ((x + 540) mod 360) - 180, which
is branch-free and sign-safe (the argument is always positive) so
Spark `%` and DuckDB `fmod` agree bit for bit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

#: mean Earth radius shared with the spherical geodesic gate surface
R_MEAN = 6371008.8

#: E-W degeneracy guard: below this |dpsi| the course is momentarily
#: zonal and dphi/dpsi -> cos(phi). The cutover value is compared on
#: identical doubles in Spark and the SQL replay, so it cannot split
#: the engines.
_EW_EPS = 1e-12


def _wrap180(deg: Column) -> Column:
    return ((deg + F.lit(540.0)) % F.lit(360.0)) - F.lit(180.0)


def rhumb_inverse(lon1: Column, lat1: Column,
                  lon2: Column, lat2: Column) -> Column:
    """struct(bearing_deg, dist_m): constant course from point 1 to
    point 2 (0..360 clockwise from north) and loxodrome length."""
    la1, la2 = F.radians(lat1), F.radians(lat2)
    dphi = la2 - la1
    dlam = F.radians(_wrap180(lon2 - lon1))
    q4 = F.lit(math.pi / 4.0)
    dpsi = (F.log(F.tan(q4 + la2 / 2)) - F.log(F.tan(q4 + la1 / 2)))
    q = (F.when(F.abs(dpsi) > F.lit(_EW_EPS), dphi / dpsi)
         .otherwise(F.cos(la1)))
    brg = (F.degrees(F.atan2(dlam, dpsi)) + F.lit(360.0)) % F.lit(360.0)
    dist = F.sqrt(dphi * dphi + q * q * dlam * dlam) * F.lit(R_MEAN)
    return F.struct(brg.alias("bearing_deg"), dist.alias("dist_m"))


def rhumb_destination(lon: Column, lat: Column,
                      bearing_deg: Column, dist_m: Column) -> Column:
    """struct(lon, lat): destination after steering ``bearing_deg``
    for ``dist_m`` metres along the rhumb line."""
    la1 = F.radians(lat)
    th = F.radians(bearing_deg)
    d = dist_m / F.lit(R_MEAN)
    dphi = d * F.cos(th)
    la2 = la1 + dphi
    q4 = F.lit(math.pi / 4.0)
    dpsi = (F.log(F.tan(q4 + la2 / 2)) - F.log(F.tan(q4 + la1 / 2)))
    q = (F.when(F.abs(dpsi) > F.lit(_EW_EPS), dphi / dpsi)
         .otherwise(F.cos(la1)))
    dlam = d * F.sin(th) / q
    lon2 = _wrap180(lon + F.degrees(dlam))
    return F.struct(lon2.alias("lon"), F.degrees(la2).alias("lat"))
