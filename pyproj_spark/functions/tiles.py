"""WebMercator z/x/y tiling — pure Catalyst expressions.

The raster<->vector tiling operator of the graft (SURVEY.md §2.6): tile
assignment is closed-form floor arithmetic on EPSG:3857 coordinates, so
it never leaves WholeStageCodegen. Writing tiles partitioned by
(z, x, y) gives the physical layout for tile materialization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: half the WebMercator world span: pi * a (WGS84)
MERC_LIMIT = 20037508.342789244


def tile_xy(x_3857: Column, y_3857: Column, z: int) -> tuple[Column, Column]:
    """(tile_x, tile_y) at zoom z from EPSG:3857 coords. y counts from the
    north edge (slippy-map convention)."""
    ntiles = 1 << z
    span = 2.0 * MERC_LIMIT / ntiles
    tx = F.floor((x_3857 + F.lit(MERC_LIMIT)) / F.lit(span)).cast("long")
    ty = F.floor((F.lit(MERC_LIMIT) - y_3857) / F.lit(span)).cast("long")
    tx = F.least(F.greatest(tx, F.lit(0)), F.lit(ntiles - 1))
    ty = F.least(F.greatest(ty, F.lit(0)), F.lit(ntiles - 1))
    return tx, ty


def tile_id(x_3857: Column, y_3857: Column, z: int) -> Column:
    """Packed long tile id: (z << 58) | (x << 29) | y."""
    tx, ty = tile_xy(x_3857, y_3857, z)
    return (F.shiftleft(F.lit(z).cast("long"), 58)
            .bitwiseOR(F.shiftleft(tx, 29)).bitwiseOR(ty))


def tile_xy_from_lonlat(lon: Column, lat: Column, z: int
                        ) -> tuple[Column, Column]:
    """Slippy tile directly from lon/lat — native (no UDF): uses the
    spherical-mercator closed form y = ln(tan(pi/4 + lat/2))."""
    ntiles = 1 << z
    tx = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * ntiles).cast("long")
    lat_r = F.radians(
        F.least(F.greatest(lat, F.lit(-85.05112877980659)),
                F.lit(85.05112877980659)))
    merc = F.log(F.tan(F.lit(3.141592653589793) / 4 + lat_r / 2))
    ty = F.floor((F.lit(1.0) - merc / F.lit(3.141592653589793))
                 / 2.0 * ntiles).cast("long")
    tx = F.least(F.greatest(tx, F.lit(0)), F.lit(ntiles - 1))
    ty = F.least(F.greatest(ty, F.lit(0)), F.lit(ntiles - 1))
    return tx, ty


def quadkey(tx: Column, ty: Column, z: int) -> Column:
    """Bing-maps quadkey string for a slippy tile: one base-4 digit per
    zoom level, MSB first (digit = 2*y_bit + x_bit) — the
    lexicographic-prefix tile key (parent = string prefix), handy for
    prefix-range pruning on string-keyed stores. Pure Catalyst: z is a
    plan-time literal so the digit fold unrolls to a flat concat."""
    digits = []
    for i in range(z):
        shift = z - 1 - i
        d = (F.shiftright(ty, shift).bitwiseAND(F.lit(1)) * 2
             + F.shiftright(tx, shift).bitwiseAND(F.lit(1)))
        digits.append(F.substring(F.lit("0123"), F.lit(1) + d.cast("int"),
                                  F.lit(1)))
    return F.concat(*digits)


def quadkey_decode(qk: Column, z: int) -> tuple[Column, Column]:
    """(tx, ty) back from a z-digit quadkey — inverse of quadkey()."""
    tx = F.lit(0).cast("long")
    ty = F.lit(0).cast("long")
    for i in range(z):
        d = (F.ascii(F.substring(qk, i + 1, 1)) - 48).cast("long")
        tx = tx * 2 + d.bitwiseAND(F.lit(1).cast("long"))
        ty = ty * 2 + F.shiftright(d, 1)
    return tx, ty
