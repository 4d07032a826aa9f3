"""+proj=pipeline grammar -> composed step kernels (SURVEY.md §2.1 T2).

Supports the step types the reference exercises in its doctests/tests
(``pyproj/transformer.py:754-803``): longlat (noop marker), unitconvert
(deg<->rad xy), axisswap, projection steps (any PROJECTIONS name,
forward or +inv), cart (geodetic<->geocentric), helmert. Steps compose
into ONE numpy kernel — the Spark analogue of PROJ fusing pipeline
steps into a single PJ object.
"""

from __future__ import annotations

import numpy as np

from pyproj_spark.crs.crs import _parse_proj_string
from pyproj_spark.kernels.datum import (
    Helmert, geocentric_to_geodetic, geodetic_to_geocentric,
)
from pyproj_spark.kernels.ellipsoid import Ellipsoid, get_ellipsoid
from pyproj_spark.kernels.projections import PROJECTIONS


def _split_steps(pipeline: str) -> tuple[dict, list[dict]]:
    toks = pipeline.split()
    if not toks or toks[0].lstrip("+") != "proj=pipeline":
        raise ValueError("not a +proj=pipeline string")
    globals_: list[str] = []
    steps: list[list[str]] = []
    cur = globals_
    for tok in toks[1:]:
        if tok.lstrip("+") == "step":
            steps.append([])
            cur = steps[-1]
        else:
            cur.append(tok)
    gparams = _parse_proj_string(" ".join(globals_))
    return gparams, [_parse_proj_string(" ".join(s)) for s in steps]


def _ellipsoid_of(params: dict, gparams: dict) -> Ellipsoid:
    p = {**gparams, **params}
    if "R" in p:
        return Ellipsoid.from_params(a=p["R"], f=0.0)
    if "a" in p:
        return Ellipsoid.from_params(a=p["a"], b=p.get("b"), rf=p.get("rf"),
                                     f=p.get("f"), es=p.get("es"))
    if "ellps" in p:
        return get_ellipsoid(p["ellps"])
    if "datum" in p:
        from pyproj_spark.crs.catalog import DATUMS
        return get_ellipsoid(DATUMS[p["datum"]][0])
    return get_ellipsoid("WGS84")


class PipelineKernel:
    """Callable (x, y, z) -> (x, y, z); angular I/O in RADIANS, matching
    PROJ pipeline semantics (use unitconvert steps for degrees)."""

    def __init__(self, pipeline: str):
        self.srs = pipeline
        gparams, step_params = _split_steps(pipeline)
        self.steps = []
        # angular I/O unit tracking (PROJ's proj_angular_input analogue):
        # 'rad' / 'deg' / None (linear)
        self.input_unit = "rad"
        self.output_unit = "rad"
        effective = [sp for sp in step_params
                     if sp.get("proj") not in (None, "longlat", "latlong",
                                               "lonlat")]
        if effective:
            first, last = effective[0], effective[-1]
            finv = bool(first.get("inv", False))
            linv = bool(last.get("inv", False))
            fname, lname = first.get("proj"), last.get("proj")
            if fname == "unitconvert":
                self.input_unit = first.get("xy_out" if finv else "xy_in",
                                            "rad")
            elif (fname in ("cart", "geocent") and finv) or \
                    (fname in PROJECTIONS and finv) or fname == "helmert":
                self.input_unit = None  # linear input
            if lname == "unitconvert":
                self.output_unit = last.get("xy_in" if linv else "xy_out",
                                            "rad")
            elif (lname in ("cart", "geocent") and not linv) or \
                    (lname in PROJECTIONS and not linv) or \
                    lname == "helmert":
                self.output_unit = None  # linear output
        for sp in step_params:
            inv = bool(sp.pop("inv", False))
            name = sp.get("proj")
            if name in (None, "longlat", "latlong", "lonlat"):
                continue  # angular noop inside a pipeline
            if name == "unitconvert":
                xy_in = sp.get("xy_in", "rad")
                xy_out = sp.get("xy_out", "rad")
                if inv:
                    xy_in, xy_out = xy_out, xy_in
                fac = {("rad", "deg"): 180.0 / np.pi,
                       ("deg", "rad"): np.pi / 180.0,
                       ("rad", "rad"): 1.0, ("deg", "deg"): 1.0}[
                    (xy_in, xy_out)]
                self.steps.append(("scale_xy", fac))
            elif name == "axisswap":
                order = sp.get("order", "2,1")
                if str(order).replace(" ", "") not in ("2,1", "2,1,3"):
                    raise ValueError(f"unsupported axisswap order {order!r}")
                self.steps.append(("swap_xy", None))
            elif name in ("cart", "geocent"):
                E = _ellipsoid_of(sp, gparams)
                self.steps.append(("cart_inv" if inv else "cart", E))
            elif name == "helmert":
                keys = ("x", "y", "z", "rx", "ry", "rz", "s")
                h = Helmert(*[float(sp.get(k, 0.0)) for k in keys])
                self.steps.append(("helmert_inv" if inv else "helmert", h))
            elif name == "molodensky":
                from pyproj_spark.kernels.datum import Molodensky
                E = _ellipsoid_of(sp, gparams)
                mo = Molodensky(
                    E, dx=float(sp.get("dx", 0.0)),
                    dy=float(sp.get("dy", 0.0)),
                    dz=float(sp.get("dz", 0.0)),
                    da=float(sp.get("da", 0.0)),
                    df=float(sp.get("df", 0.0)),
                    abridged="abridged" in sp)
                self.steps.append(("molo_inv" if inv else "molo", mo))
            elif name == "hgridshift":
                from pyproj_spark.kernels.grids import get_grid
                gname = str(sp.get("grids", ""))
                try:
                    grid = get_grid(gname)
                except KeyError:
                    raise ValueError(
                        f"grid {gname!r} is not registered; see "
                        "kernels.grids.register_grid") from None
                self.steps.append(("hgrid_inv" if inv else "hgrid", grid))
            elif name in PROJECTIONS:
                E = _ellipsoid_of(sp, gparams)
                params = {k: v for k, v in sp.items()
                          if k not in ("proj", "ellps", "datum", "R", "a",
                                       "b", "rf", "f", "es")}
                if name == "utm":
                    proj = PROJECTIONS[name](E, zone=int(params.pop("zone")),
                                             south=bool(params.pop("south",
                                                                   False)))
                else:
                    if "k" in params:
                        params["k_0"] = params.pop("k")
                    proj = PROJECTIONS[name](E, **params)
                self.steps.append(("proj_inv" if inv else "proj", proj))
            else:
                raise ValueError(f"unsupported pipeline step +proj={name}")

    def __call__(self, x, y, z=None):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        z = np.zeros_like(x) if z is None else np.asarray(z, np.float64)
        with np.errstate(all="ignore"):
            for kind, arg in self.steps:
                if kind == "scale_xy":
                    x, y = x * arg, y * arg
                elif kind == "swap_xy":
                    x, y = y, x
                elif kind == "proj":
                    x, y = arg.forward(x, y)
                elif kind == "proj_inv":
                    x, y = arg.inverse(x, y)
                elif kind == "cart":
                    x, y, z = geodetic_to_geocentric(arg, x, y, z)
                elif kind == "cart_inv":
                    x, y, z = geocentric_to_geodetic(arg, x, y, z)
                elif kind == "helmert":
                    x, y, z = arg.forward(x, y, z)
                elif kind == "helmert_inv":
                    x, y, z = arg.inverse(x, y, z)
                elif kind == "molo":
                    x, y, z = arg.forward(x, y, z)
                elif kind == "molo_inv":
                    x, y, z = arg.inverse(x, y, z)
                elif kind in ("hgrid", "hgrid_inv"):
                    # angular step (radians, PROJ hgridshift semantics);
                    # out-of-coverage points pass through unchanged
                    lon, lat = np.degrees(x), np.degrees(y)
                    m = arg.contains(lon, lat)
                    if kind == "hgrid":
                        glon, glat = arg.apply(lon, lat)
                    else:
                        glon, glat = arg.apply_inverse(lon, lat)
                    x = np.where(m, np.radians(glon), x)
                    y = np.where(m, np.radians(glat), y)
        return x, y, z


class PipelineTransformer:
    """Transformer-like facade over a pipeline kernel — degrees I/O when
    the pipeline starts/ends angular is handled by explicit unitconvert
    steps, exactly like PROJ."""

    def __init__(self, pipeline: str):
        self._k = PipelineKernel(pipeline)
        self.srs = pipeline

    def transform(self, xx, yy, zz=None, radians: bool = False,
                  errcheck: bool = False):
        scalar = np.isscalar(xx) and np.isscalar(yy)
        x = np.atleast_1d(np.asarray(xx, dtype=np.float64))
        y = np.atleast_1d(np.asarray(yy, dtype=np.float64))
        z = (np.atleast_1d(np.asarray(zz, dtype=np.float64))
             if zz is not None else None)
        # user-unit <-> pipeline-unit scaling (reference
        # _transformer.pyx:809-817,840-848 deg/rad folding)
        if self._k.input_unit == "rad" and not radians:
            x, y = np.radians(x), np.radians(y)
        elif self._k.input_unit == "deg" and radians:
            x, y = np.degrees(x), np.degrees(y)
        xo, yo, zo = self._k(x, y, z)
        if self._k.output_unit == "rad" and not radians:
            xo, yo = np.degrees(xo), np.degrees(yo)
        elif self._k.output_unit == "deg" and radians:
            xo, yo = np.radians(xo), np.radians(yo)
        if errcheck and (~np.isfinite(xo) | ~np.isfinite(yo)).any():
            raise RuntimeError("pipeline transform error")
        if scalar:
            return ((float(xo[0]), float(yo[0]), float(zo[0]))
                    if zz is not None else (float(xo[0]), float(yo[0])))
        return (xo, yo, zo) if zz is not None else (xo, yo)
