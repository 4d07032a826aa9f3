"""Gridded datum shifts — NADCON/NTv2-style lat/lon shift grids with
bilinear interpolation (reference surface: ``pyproj/transformer.py:
362-406`` grid-based operations and PROJ's hgridshift step).

A :class:`ShiftGrid` stores the shift field on a regular lon/lat grid
(arc-seconds, positive east/north, NADCON convention); applying it is
one vectorized bilinear pass. The inverse direction uses the standard
NADCON fixed-point iteration (interpolate at the current estimate,
subtract, repeat — converges in 3-4 rounds since the field is smooth
and tiny relative to the cell size).

CONTAINER NOTE: real NADCON/NTv2 grid FILES are not shipped in this
environment (PROJ CDN downloads are out of scope), so the registered
NAD27<->NAD83 grid below is a SYNTHETIC deterministic stand-in: the
node values are a closed-form function of the node indices. The format,
registry, interpolation, fallback and per-row op bookkeeping — i.e. all
the Spark-side plumbing — are real and oracle-checked (the closed form
is reproduced in DuckDB SQL by the ``grid_shift`` driver query); drop
in real grid node arrays and nothing else changes.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class ShiftGrid:
    """Regular lon/lat shift grid. dlon/dlat in arc-seconds on an
    (ny, nx) node lattice; node (0, 0) is (west, south)."""

    name: str
    west: float
    south: float
    east: float
    north: float
    nx: int
    ny: int
    dlon_sec: np.ndarray  # (ny, nx), positive east
    dlat_sec: np.ndarray  # (ny, nx), positive north

    @property
    def dx(self) -> float:
        return (self.east - self.west) / (self.nx - 1)

    @property
    def dy(self) -> float:
        return (self.north - self.south) / (self.ny - 1)

    def contains(self, lon, lat) -> np.ndarray:
        # 1e-9 deg (~0.1 mm) tolerance: a degrees->radians->degrees
        # roundtrip can land a boundary point 1 ulp outside the window
        return ((lon >= self.west - 1e-9) & (lon <= self.east + 1e-9)
                & (lat >= self.south - 1e-9) & (lat <= self.north + 1e-9))

    def interpolate(self, lon, lat):
        """Bilinear shift at (lon, lat) degrees -> (dlon_deg, dlat_deg).
        Caller is responsible for masking to :meth:`contains`."""
        fx = (np.asarray(lon, dtype=np.float64) - self.west) / self.dx
        fy = (np.asarray(lat, dtype=np.float64) - self.south) / self.dy
        ix = np.clip(np.floor(fx).astype(np.int64), 0, self.nx - 2)
        iy = np.clip(np.floor(fy).astype(np.int64), 0, self.ny - 2)
        tx = fx - ix
        ty = fy - iy
        out = []
        for f in (self.dlon_sec, self.dlat_sec):
            v = (f[iy, ix] * (1 - tx) * (1 - ty)
                 + f[iy, ix + 1] * tx * (1 - ty)
                 + f[iy + 1, ix] * (1 - tx) * ty
                 + f[iy + 1, ix + 1] * tx * ty)
            out.append(v / 3600.0)
        return out[0], out[1]

    def apply(self, lon, lat):
        """src -> dst datum (forward): add the interpolated shift."""
        dlon, dlat = self.interpolate(lon, lat)
        return lon + dlon, lat + dlat

    def apply_inverse(self, lon, lat, iterations: int = 4):
        """dst -> src datum: NADCON fixed-point iteration."""
        src_lon = np.array(lon, dtype=np.float64, copy=True)
        src_lat = np.array(lat, dtype=np.float64, copy=True)
        for _ in range(iterations):
            dlon, dlat = self.interpolate(src_lon, src_lat)
            src_lon = lon - dlon
            src_lat = lat - dlat
        return src_lon, src_lat


# --------------------------------------------------------- synthetic grid

#: closed-form node values (arc-seconds) — REPRODUCED IN SQL by the
#: grid_shift oracle query; keep both definitions in sync
def _synth_dlon_sec(ix, iy):
    return 0.35 * np.sin(0.11 * ix) + 0.21 * np.cos(0.07 * iy) + 0.8


def _synth_dlat_sec(ix, iy):
    return 0.27 * np.cos(0.05 * ix) - 0.18 * np.sin(0.13 * iy) + 0.4


def build_synthetic_conus_grid() -> ShiftGrid:
    """Deterministic NAD27->NAD83 stand-in over the CONUS window
    (realistic magnitude: shifts of ~0.2-1.4 arcsec, i.e. 5-40 m)."""
    west, south, east, north = -125.0, 24.0, -66.0, 50.0
    nx, ny = 237, 105  # 0.25 deg step
    ix = np.arange(nx, dtype=np.float64)[None, :]
    iy = np.arange(ny, dtype=np.float64)[:, None]
    return ShiftGrid(
        name="us_synth_conus.tif", west=west, south=south, east=east,
        north=north, nx=nx, ny=ny,
        dlon_sec=np.broadcast_to(_synth_dlon_sec(ix, iy),
                                 (ny, nx)).copy(),
        dlat_sec=np.broadcast_to(_synth_dlat_sec(ix, iy),
                                 (ny, nx)).copy())


_GRIDS: dict = {}
#: (src datum, dst datum) -> grid name; forward = add shift
GRID_REGISTRY: dict = {}


def register_grid(src_datum: str, dst_datum: str, grid: ShiftGrid):
    _GRIDS[grid.name] = grid
    GRID_REGISTRY[(src_datum, dst_datum)] = grid.name


def get_grid(name: str) -> ShiftGrid:
    return _GRIDS[name]


def load_grid_file(path, name: str | None = None) -> ShiftGrid:
    """Load a shift grid from an ``.npz`` node-array file (keys:
    ``west south east north dlon_sec dlat_sec``) — the engine's
    on-disk grid format for files fetched by
    ``sync._download_resource_file`` (the reference consumes PROJ's
    GeoTIFF CDN files; GDAL is unavailable here, so the same node
    lattice travels as a numpy archive).
    """
    import os
    with np.load(path) as z:
        dlon = np.asarray(z["dlon_sec"], dtype=np.float64)
        dlat = np.asarray(z["dlat_sec"], dtype=np.float64)
        if dlon.shape != dlat.shape or dlon.ndim != 2:
            raise ValueError(f"malformed grid file {path}: "
                             f"{dlon.shape} vs {dlat.shape}")
        ny, nx = dlon.shape
        return ShiftGrid(
            name=name or os.path.basename(str(path)),
            west=float(z["west"]), south=float(z["south"]),
            east=float(z["east"]), north=float(z["north"]),
            nx=nx, ny=ny, dlon_sec=dlon, dlat_sec=dlat)


def save_grid_file(grid: ShiftGrid, path) -> None:
    """Inverse of :func:`load_grid_file` (test fixtures, re-export)."""
    np.savez(path, west=grid.west, south=grid.south, east=grid.east,
             north=grid.north, dlon_sec=grid.dlon_sec,
             dlat_sec=grid.dlat_sec)


def register_grid_file(path, src_datum: str, dst_datum: str,
                       name: str | None = None) -> ShiftGrid:
    """Load + register a downloaded grid file in one step."""
    grid = load_grid_file(path, name=name)
    register_grid(src_datum, dst_datum, grid)
    return grid


def grid_for(src_datum, dst_datum):
    """(grid, inverse?) for a datum pair, or (None, False)."""
    name = GRID_REGISTRY.get((src_datum, dst_datum))
    if name is not None:
        return _GRIDS[name], False
    name = GRID_REGISTRY.get((dst_datum, src_datum))
    if name is not None:
        return _GRIDS[name], True
    return None, False


register_grid("NAD27", "NAD83", build_synthetic_conus_grid())


# --------------------------------------------------------- geoid grids

@dataclass
class GeoidGrid:
    """Scalar geoid-undulation grid N(lon, lat) in meters on a regular
    lon/lat node lattice (the vertical analogue of :class:`ShiftGrid`;
    reference surface: PROJ's vgridshift step, which is what pyproj's
    compound-CRS transforms run through — transformer.py:841-985 z
    semantics). Ellipsoidal height = gravity-related height + N."""

    name: str
    west: float
    south: float
    east: float
    north: float
    nx: int
    ny: int
    n_m: np.ndarray  # (ny, nx) undulation, meters

    @property
    def dx(self) -> float:
        return (self.east - self.west) / (self.nx - 1)

    @property
    def dy(self) -> float:
        return (self.north - self.south) / (self.ny - 1)

    def interpolate(self, lon, lat):
        """Bilinear N at (lon, lat) degrees; out-of-window points clamp
        to the edge cell (the global synthetic grid has no outside)."""
        fx = (np.asarray(lon, dtype=np.float64) - self.west) / self.dx
        fy = (np.asarray(lat, dtype=np.float64) - self.south) / self.dy
        ix = np.clip(np.floor(fx).astype(np.int64), 0, self.nx - 2)
        iy = np.clip(np.floor(fy).astype(np.int64), 0, self.ny - 2)
        tx = np.clip(fx - ix, 0.0, 1.0)
        ty = np.clip(fy - iy, 0.0, 1.0)
        f = self.n_m
        return (f[iy, ix] * (1 - tx) * (1 - ty)
                + f[iy, ix + 1] * tx * (1 - ty)
                + f[iy + 1, ix] * (1 - tx) * ty
                + f[iy + 1, ix + 1] * tx * ty)


#: closed-form geoid node values (meters) — REPRODUCED IN SQL by the
#: vertical_shift oracle query; keep both definitions in sync
def _synth_geoid_m(ix, iy):
    return (-12.0 + 9.0 * np.sin(0.045 * ix) + 7.0 * np.cos(0.03 * iy)
            + 2.0 * np.sin(0.011 * ix * iy % 6.0))


def build_synthetic_geoid() -> GeoidGrid:
    """Deterministic global geoid stand-in (realistic magnitude:
    undulations of roughly -28..+6 m; the real EGM field spans about
    -107..+85 m). 1-degree node step."""
    west, south, east, north = -180.0, -90.0, 180.0, 90.0
    nx, ny = 361, 181
    ix = np.arange(nx, dtype=np.float64)[None, :]
    iy = np.arange(ny, dtype=np.float64)[:, None]
    return GeoidGrid(
        name="synth_geoid_2025.tif", west=west, south=south, east=east,
        north=north, nx=nx, ny=ny,
        n_m=np.broadcast_to(_synth_geoid_m(ix, iy), (ny, nx)).copy())


_GEOIDS: dict = {}
#: vertical datum (or geoid model) name -> geoid grid name
GEOID_REGISTRY: dict = {}


def register_geoid(key: str, grid: GeoidGrid):
    _GEOIDS[grid.name] = grid
    GEOID_REGISTRY[str(key).upper()] = grid.name


def geoid_for(key) -> GeoidGrid | None:
    name = GEOID_REGISTRY.get(str(key).upper())
    return _GEOIDS[name] if name is not None else None


_SYNTH_GEOID = build_synthetic_geoid()
for _k in ("SYNTH GEOID 2025", "SYNTH2025", "NAVD88 (SYNTH)"):
    register_geoid(_k, _SYNTH_GEOID)
