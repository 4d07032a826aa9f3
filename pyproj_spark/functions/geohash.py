"""Geohash encode/decode as pure Catalyst bit math — no UDFs.

Geohash (public-domain spec, Niemeyer 2008) interleaves longitude and
latitude bisection bits MSB-first (longitude gets the even positions)
and emits 5-bit groups in a base-32 alphabet. Because the engine's
inputs are already bounded doubles, the whole encoding is closed-form
integer arithmetic — index = floor((x - lo) / range * 2^bits) — so it
compiles into whole-stage codegen and doubles as a second, independent
cell-index family next to the engine's geocell (Z-order) scheme:
geohash for interop with external systems, geocell for the join-key
paths.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: the standard geohash base-32 alphabet (no a/i/l/o)
ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _clamp(col: Column, lo: float, hi: float) -> Column:
    return F.least(F.greatest(col, F.lit(lo)), F.lit(hi))


def geohash_encode(lon: Column, lat: Column,
                   precision: int = 6) -> Column:
    """Geohash string of ``precision`` characters (native exprs)."""
    n_bits = 5 * precision
    lon_bits = (n_bits + 1) // 2  # longitude owns the even slots
    lat_bits = n_bits // 2
    lon_idx = _clamp(
        F.floor((_clamp(lon, -180.0, 180.0) + 180.0) / 360.0
                * float(1 << lon_bits)).cast("long"),
        0, (1 << lon_bits) - 1).cast("long")
    lat_idx = _clamp(
        F.floor((_clamp(lat, -90.0, 90.0) + 90.0) / 180.0
                * float(1 << lat_bits)).cast("long"),
        0, (1 << lat_bits) - 1).cast("long")
    inter = F.lit(0).cast("long")
    for i in range(lon_bits):
        bit = F.shiftright(lon_idx, lon_bits - 1 - i).bitwiseAND(
            F.lit(1).cast("long"))
        inter = inter + bit * F.lit(1 << (n_bits - 1 - 2 * i)).cast(
            "long")
    for j in range(lat_bits):
        bit = F.shiftright(lat_idx, lat_bits - 1 - j).bitwiseAND(
            F.lit(1).cast("long"))
        inter = inter + bit * F.lit(1 << (n_bits - 2 - 2 * j)).cast(
            "long")
    chars = F.array(*[F.lit(c) for c in ALPHABET])
    out = [F.element_at(
        chars,
        (F.shiftright(inter, 5 * (precision - 1 - k))
         .bitwiseAND(F.lit(31).cast("long")) + 1).cast("int"))
        for k in range(precision)]
    return F.concat(*out)


def geohash_decode(gh: Column, precision: int = 6) -> Column:
    """struct(lon, lat) of the CELL CENTER for fixed-length geohashes
    (native exprs; the inverse of geohash_encode at the same
    precision)."""
    n_bits = 5 * precision
    lon_bits = (n_bits + 1) // 2
    lat_bits = n_bits // 2
    # char -> value via array_position over the alphabet (1-based);
    # deinterleave per 5-bit group rather than through one big
    # interleaved integer — each group value appears in <= 5 bit
    # extractions, keeping the expression tree linear in precision
    chars = F.array(*[F.lit(c) for c in ALPHABET])
    vals = [(F.array_position(chars, F.substring(gh, k + 1, 1)) - 1)
            .cast("long") for k in range(precision)]
    lon_idx = F.lit(0).cast("long")
    lat_idx = F.lit(0).cast("long")
    for b in range(n_bits):  # b = position from the MSB
        bit = F.shiftright(vals[b // 5], 4 - b % 5).bitwiseAND(
            F.lit(1).cast("long"))
        if b % 2 == 0:  # even slots are longitude
            i = b // 2
            lon_idx = lon_idx + bit * F.lit(
                1 << (lon_bits - 1 - i)).cast("long")
        else:
            j = b // 2
            lat_idx = lat_idx + bit * F.lit(
                1 << (lat_bits - 1 - j)).cast("long")
    lon = (lon_idx.cast("double") + 0.5) / float(1 << lon_bits) \
        * 360.0 - 180.0
    lat = (lat_idx.cast("double") + 0.5) / float(1 << lat_bits) \
        * 180.0 - 90.0
    return F.struct(lon.alias("lon"), lat.alias("lat"))
