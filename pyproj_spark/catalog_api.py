"""Catalog / database query operators (SURVEY.md §2.4) as DataFrame
queries over the bundled EPSG-subset table — the Spark mapping of
PROJ's proj.db SQLite queries (reference ``pyproj/database.pyx``).

The catalog is tiny, so every query is a broadcastable DataFrame the
optimizer folds into filters; the same functions also exist driver-side
(plain python) where the reference returns python lists.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyproj_spark.aoi import AreaOfInterest
from pyproj_spark.crs import catalog
from pyproj_spark.kernels.ellipsoid import _ELLPS

#: rough areas of use per datum for bbox filtering (west, south, east,
#: north) — coarse but sufficient for AOI pruning semantics
_DATUM_AOU = {
    "WGS84": (-180, -90, 180, 90),
    "ETRS89": (-16.1, 32.88, 40.18, 84.73),
    "NAD83": (167.65, 14.92, -47.74, 86.46),
    "GGRS87": (19.57, 34.88, 29.73, 41.75),
    "ED50": (-16.1, 25.71, 48.61, 84.73),
    "NAD27": (167.65, 7.15, -47.74, 83.17),
    "OSGB36": (-9.0, 49.75, 2.01, 61.01),
    "NZGD2000": (160.6, -55.95, -171.2, -25.88),
    "pulkovo42": (19.57, 39.95, -168.97, 85.19),
    "potsdam": (5.86, 47.27, 15.04, 55.09),
    "JGD2000": (122.38, 17.09, 157.65, 46.05),
    "JGD2011": (122.38, 17.09, 157.65, 46.05),
    "belge72": (2.5, 49.5, 6.4, 51.51),
    "sjtsk": (12.09, 47.73, 22.56, 51.06),
}


def crs_catalog_df(spark: SparkSession) -> DataFrame:
    """The catalog as a DataFrame: auth, code, type, name, datum + AOU."""
    rows = []
    for auth, code, kind, name, datum in catalog.all_codes():
        w, s, e, n = _DATUM_AOU.get(datum, (-180, -90, 180, 90))
        rows.append((auth, code, kind, name, datum, False,
                     float(w), float(s), float(e), float(n)))
    return spark.createDataFrame(
        rows, "auth_name string, code int, type string, name string, "
              "datum string, deprecated boolean, west double, "
              "south double, east double, north double")


def get_authorities(spark) -> list[str]:
    """reference pyproj/database.pyx:54-79 — the bundled namespaces
    (EPSG from the catalog DataFrame plus the static ESRI/IGNF/OGC
    tables in crs/catalog.py)."""
    epsg = {r[0] for r in
            crs_catalog_df(spark).select("auth_name").distinct().collect()}
    return sorted(epsg | set(catalog.AUTHORITY_NAMES))


def get_codes(spark, auth_name: str, pj_type: str,
              allow_deprecated: bool = False) -> list[int]:
    """reference pyproj/database.pyx:82-126"""
    df = crs_catalog_df(spark).filter(
        (F.col("auth_name") == auth_name) & (F.col("type") == pj_type))
    if not allow_deprecated:
        df = df.filter(~F.col("deprecated"))
    return sorted(r[0] for r in df.select("code").collect())


def query_crs_info(spark, auth_name: str | None = None,
                   pj_types: list[str] | None = None,
                   area_of_interest: AreaOfInterest | None = None,
                   contains: bool = False,
                   allow_deprecated: bool = False) -> DataFrame:
    """reference pyproj/database.pyx:129-277 — returns the filtered
    catalog DataFrame (CRSInfo rows)."""
    df = crs_catalog_df(spark)
    if auth_name:
        df = df.filter(F.col("auth_name") == auth_name)
    if pj_types:
        df = df.filter(F.col("type").isin(list(pj_types)))
    if not allow_deprecated:
        df = df.filter(~F.col("deprecated"))
    if area_of_interest is not None:
        a = area_of_interest
        if contains:
            # CRS area CONTAINS the AOI
            df = df.filter(
                (F.col("west") <= a.west_lon_degree)
                & (F.col("east") >= a.east_lon_degree)
                & (F.col("south") <= a.south_lat_degree)
                & (F.col("north") >= a.north_lat_degree))
        else:
            df = df.filter(
                (F.col("west") < a.east_lon_degree)
                & (F.lit(a.west_lon_degree) < F.col("east"))
                & (F.col("south") < a.north_lat_degree)
                & (F.lit(a.south_lat_degree) < F.col("north")))
    return df


def query_utm_crs_info(spark, datum_name: str | None = None,
                       area_of_interest: AreaOfInterest | None = None
                       ) -> DataFrame:
    """reference pyproj/database.pyx:280-322 — UTM-zone finder. Also
    computable analytically: zone = floor((lon+180)/6)+1."""
    df = crs_catalog_df(spark).filter(F.col("name").contains("UTM zone"))
    if datum_name:
        df = df.filter(F.col("datum") == datum_name)
    if area_of_interest is not None:
        a = area_of_interest
        zone_w = int((a.west_lon_degree + 180) // 6) + 1
        zone_e = int((a.east_lon_degree + 180) // 6) + 1
        zone = F.regexp_extract("name", r"UTM zone (\d+)", 1).cast("int")
        hemi = F.regexp_extract("name", r"UTM zone \d+([NS])", 1)
        df = df.filter(zone.between(zone_w, zone_e))
        if a.south_lat_degree >= 0:
            df = df.filter(hemi == "N")
        elif a.north_lat_degree <= 0:
            df = df.filter(hemi == "S")
    return df


def query_geodetic_crs_from_datum(spark, datum_name: str) -> DataFrame:
    """reference pyproj/database.pyx:471-566 — CRSs sharing a datum."""
    return crs_catalog_df(spark).filter(
        (F.col("datum") == datum_name)
        & F.col("type").startswith("GEOGRAPHIC"))


def get_ellps_map() -> dict:
    """reference pyproj/list.pyx:21-40."""
    out = {}
    for name, (a, rf, b) in _ELLPS.items():
        d = {"a": a, "description": name}
        if rf is not None:
            d["rf"] = rf
        if b is not None:
            d["b"] = b
        out[name] = d
    return out


def get_units_map() -> dict:
    """reference pyproj/database.pyx:362-425 (subset: linear units)."""
    return {
        "metre": {"to_meter": 1.0, "category": "linear"},
        "US survey foot": {"to_meter": catalog.US_FT, "category": "linear"},
        "foot": {"to_meter": 0.3048, "category": "linear"},
        "kilometre": {"to_meter": 1000.0, "category": "linear"},
        "degree": {"to_meter": math.nan, "category": "angular"},
        "arc-second": {"to_meter": math.nan, "category": "angular"},
        "grad": {"to_meter": math.nan, "category": "angular"},
    }


def get_proj_operations_map() -> dict:
    """reference pyproj/list.pyx:4-28 — {proj id: description} for every
    operation this engine's kernel registry implements."""
    descriptions = {
        "longlat": "Lat/long (Geodetic alias)",
        "latlong": "Lat/long (Geodetic alias)",
        "geocent": "Geocentric",
        "webmerc": "Web Mercator / Pseudo Mercator",
        "merc": "Mercator",
        "tmerc": "Transverse Mercator",
        "etmerc": "Extended Transverse Mercator",
        "utm": "Universal Transverse Mercator (UTM)",
        "lcc": "Lambert Conformal Conic",
        "laea": "Lambert Azimuthal Equal Area",
        "aeqd": "Azimuthal Equidistant",
        "stere": "Stereographic",
        "eqc": "Equidistant Cylindrical (Plate Carree)",
        "sinu": "Sinusoidal (Sanson-Flamsteed)",
        "geos": "Geostationary Satellite View",
        "aea": "Albers Equal Area",
        "cea": "Equal Area Cylindrical",
        "ortho": "Orthographic",
        "nsper": "Near-sided perspective",
        "ob_tran": "General Oblique Transformation",
        "omerc": "Oblique Mercator",
        "poly": "Polyconic (American)",
        "somerc": "Swiss. Obl. Mercator",
        "moll": "Mollweide",
        "bonne": "Bonne",
        "vandg": "Van Der Grinten",
        "wintri": "Winkel Tripel",
        "hammer": "Hammer Aitoff",
        "aitoff": "Aitoff",
        "mill": "Miller Cylindrical",
        "gnom": "Gnomonic",
        "cass": "Cassini",
        "krovak": "Krovak",
    }
    from pyproj_spark.kernels.projections import PROJECTIONS
    out = {k: descriptions.get(k, k) for k in sorted(PROJECTIONS)}
    out["geocent"] = descriptions["geocent"]
    return out


def get_prime_meridians_map() -> dict:
    """reference pyproj/list.pyx:43-57 — {name: proj offset string};
    values are the public PROJ prime-meridian table."""
    return {
        "greenwich": "0dE",
        "lisbon": "9d07'54.862\"W",
        "paris": "2d20'14.025\"E",
        "bogota": "74d04'51.3\"W",
        "madrid": "3d41'16.58\"W",
        "rome": "12d27'8.4\"E",
        "bern": "7d26'22.5\"E",
        "jakarta": "106d48'27.79\"E",
        "ferro": "17d40'W",
        "brussels": "4d22'4.71\"E",
        "stockholm": "18d3'29.8\"E",
        "athens": "23d42'58.815\"E",
        "oslo": "10d43'22.5\"E",
    }


def get_database_metadata(key: str) -> str | None:
    """reference pyproj/database.pyx:428-468."""
    meta = {
        "DATABASE.LAYOUT.VERSION.MAJOR": "1",
        "DATABASE.LAYOUT.VERSION.MINOR": "0",
        "EPSG.VERSION": "bundled-subset",
    }
    return meta.get(key)


# ------------------------------------------------- TransformerGroup analog

@dataclass
class CandidateOperation:
    name: str
    accuracy: float            # metres; -1 = unknown
    area_overlap: float        # [0,1] overlap with requested AOI
    is_ballpark: bool
    available: bool
    grids: tuple = ()          # grid filenames the op depends on
    superseded: bool = False


#: datum pair -> inventory grids implementing the shift: (filename,
#: accuracy metres, superseded?). Entries are public proj-data registry
#: facts; availability = registered in kernels.grids (downloadable
#: files are out of scope here, so unregistered ones land in
#: unavailable_operations — the reference's not-downloaded semantics).
_PAIR_GRIDS = {
    ("NAD27", "NAD83"): (
        ("us_synth_conus.tif", 0.15, False),
        ("us_noaa_conshpgn.tif", 0.15, False),
        ("us_noaa_alhpgn.tif", 0.5, False),
        ("us_noaa_nadcon5_nad27_nad83_1986_conus.tif", 0.5, True),
    ),
    ("OSGB36", "ETRS89"): (
        ("uk_os_OSTN15_NTv2_OSGBtoETRS.tif", 0.03, False),
    ),
}


class TransformerGroup:
    """Enumerate candidate operations for a CRS pair, sorted by
    (area overlap desc, accuracy asc, unknown-accuracy last) — the sort
    contract of reference ``pyproj/transformer.py:215-222`` /
    ``_transformer.pyx:141-149``. Candidates: registered grid shifts
    (best accuracy), inventory grids that are not downloaded (->
    ``unavailable_operations``, reference transformer.py:206-413),
    the towgs84 Helmert path, and a ballpark fallback.

    ``allow_superseded`` includes superseded grid operations
    (reference transformer.py:240). ``download_grids=True`` attempts to
    fetch missing grids — network is out of scope in this engine, so it
    only triggers the documented warning (reference downloads from the
    PROJ CDN and re-runs the enumeration)."""

    def __init__(self, crs_from, crs_to,
                 area_of_interest: AreaOfInterest | None = None,
                 allow_ballpark: bool = True,
                 allow_superseded: bool = False,
                 download_grids: bool = False, **_kw):
        from pyproj_spark.crs.crs import CRS
        from pyproj_spark.kernels.grids import _GRIDS
        from pyproj_spark.plans.spec import Transformer

        src = CRS.from_user_input(crs_from)
        dst = CRS.from_user_input(crs_to)
        ops = []
        unavailable = []

        def _aoi_overlap(w, s, e, n) -> float:
            if area_of_interest is None:
                return 1.0
            a = area_of_interest
            iw = max(w, a.west_lon_degree)
            ie = min(e, a.east_lon_degree)
            is_ = max(s, a.south_lat_degree)
            in_ = min(n, a.north_lat_degree)
            if ie <= iw or in_ <= is_:
                return 0.0
            aoi_area = ((a.east_lon_degree - a.west_lon_degree)
                        * (a.north_lat_degree - a.south_lat_degree))
            return ((ie - iw) * (in_ - is_)) / aoi_area if aoi_area else 0.0

        pair_grids = _PAIR_GRIDS.get((src.datum_name, dst.datum_name)) \
            or _PAIR_GRIDS.get((dst.datum_name, src.datum_name)) or ()
        for fname, acc, superseded in pair_grids:
            if superseded and not allow_superseded:
                continue
            g = _GRIDS.get(fname)
            if g is not None:
                overlap = _aoi_overlap(g.west, g.south, g.east, g.north)
                if overlap == 0.0 and area_of_interest is not None:
                    continue
                ops.append(CandidateOperation(
                    name=f"{src.datum_name} to {dst.datum_name} "
                         f"(hgridshift {fname})",
                    accuracy=acc, area_overlap=overlap,
                    is_ballpark=False, available=True, grids=(fname,),
                    superseded=superseded))
            else:
                if download_grids:
                    import warnings
                    warnings.warn(
                        f"grid {fname} cannot be downloaded in this "
                        "environment; register node arrays via "
                        "kernels.grids.register_grid", UserWarning)
                unavailable.append(CandidateOperation(
                    name=f"{src.datum_name} to {dst.datum_name} "
                         f"(hgridshift {fname})",
                    accuracy=acc, area_overlap=1.0, is_ballpark=False,
                    available=False, grids=(fname,),
                    superseded=superseded))
        if src.towgs84 is not None and dst.towgs84 is not None:
            n_params = max(
                len([v for v in src.towgs84 if v != 0]) and
                (7 if len(src.towgs84) > 3 else 3), 3)
            acc = 1.0 if len(src.towgs84) > 3 or len(dst.towgs84) > 3 \
                else (2.0 if any(src.towgs84) or any(dst.towgs84) else 0.01)
            ops.append(CandidateOperation(
                name=f"{src.datum_name or 'src'} to "
                     f"{dst.datum_name or 'dst'} ({n_params}-param Helmert)",
                accuracy=acc, area_overlap=1.0, is_ballpark=False,
                available=True))
        if allow_ballpark:
            ops.append(CandidateOperation(
                name="Ballpark geographic offset",
                accuracy=-1.0, area_overlap=1.0, is_ballpark=True,
                available=True))
        # sort contract: overlap desc, accuracy asc, unknown (-1) last
        ops.sort(key=lambda o: (-o.area_overlap,
                                o.accuracy < 0, o.accuracy))
        self.operations = ops
        self.unavailable_operations = unavailable
        self._transformers = [
            Transformer.from_crs(src, dst, always_xy=False)
            for _ in ops]

    @property
    def transformers(self):
        return self._transformers

    @property
    def best_available(self) -> bool:
        return bool(self.operations) and self.operations[0].available

    def download_grids(self, directory=None, open_license: bool = True,
                       verbose: bool = False):
        """reference transformer.py:383-413 — network is out of scope;
        see sync._download_resource_file."""
        from pyproj_spark.sync import _download_resource_file
        for op in self.unavailable_operations:
            for g in op.grids:
                _download_resource_file(f"https://cdn.proj.org/{g}", g,
                                        directory)
