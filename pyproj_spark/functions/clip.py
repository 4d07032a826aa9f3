"""Polygon clipping to axis-aligned rectangles — pure Catalyst array
HOFs, no UDF: the vector-tile materialization step (clip every
geometry to each tile's bounds) as expressions that stay inside
whole-stage codegen.

Algorithm: Sutherland–Hodgman (1974, public) specialized to the four
half-planes of a rectangle: each pass walks the ring's edges (p, q)
and emits [intersection?] + [q if inside] — implemented as
zip_with(ring, rotate(ring)) -> per-edge 2-slot array -> flatten ->
filter(not null). Four chained passes clip to the full rectangle.
Area comes from a LEFT-FOLD shoelace (F.aggregate / list_reduce), so
the summation order is the ring order on both engines — bit-identical
results with no aggregation-order caveat.

Scale note: clipping runs per (geometry, tile) candidate row AFTER a
bbox-overlap prefilter, exactly the cell-prefilter + exact-test shape
of the PIP join; the expressions are O(ring length) per row with no
shuffle of their own.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _edges(ring: Column) -> Column:
    """array<struct<p, q>> of consecutive ring edges (closing edge
    included): q-list is the ring rotated left by one."""
    n = F.size(ring)
    # greatest(n-1, 0): slice() throws on negative length when a
    # previous clip pass emptied the ring
    rot = F.concat(F.slice(ring, 2, F.greatest(n - 1, F.lit(0))),
                   F.slice(ring, 1, 1))
    return F.zip_with(ring, rot,
                      lambda p, q: F.struct(p.alias("p"), q.alias("q")))


def _clip_half(ring: Column, axis: str, bound, keep_ge: bool) -> Column:
    """One Sutherland–Hodgman pass against x>=b / x<=b / y>=b / y<=b.
    ``bound`` may be a scalar or a per-row Column (tile bounds)."""
    b = bound if isinstance(bound, Column) else F.lit(float(bound))

    def val(pt):
        return pt[axis]

    def inside(pt):
        return val(pt) >= b if keep_ge else val(pt) <= b

    def inter(p, q):
        t = (b - val(p)) / (val(q) - val(p))
        if axis == "x":
            return F.struct(b.alias("x"),
                            (p["y"] + t * (q["y"] - p["y"])).alias("y"))
        return F.struct((p["x"] + t * (q["x"] - p["x"])).alias("x"),
                        b.alias("y"))

    def per_edge(e):
        p, q = e["p"], e["q"]
        cross = inside(p) != inside(q)
        return F.array(F.when(cross, inter(p, q)),
                       F.when(inside(q), q))

    out = F.flatten(F.transform(_edges(ring), per_edge))
    return F.filter(out, lambda s: s.isNotNull())


def clip_to_rect(ring: Column, xmin, ymin, xmax, ymax) -> Column:
    """Ring clipped to [xmin,xmax]x[ymin,ymax]; possibly empty."""
    r = _clip_half(ring, "x", xmin, True)
    r = _clip_half(r, "x", xmax, False)
    r = _clip_half(r, "y", ymin, True)
    r = _clip_half(r, "y", ymax, False)
    return r


def ring_area2(ring: Column) -> Column:
    """Twice the signed planar shoelace area via a LEFT FOLD over the
    edge list (deterministic summation order)."""
    return F.aggregate(
        _edges(ring), F.lit(0.0),
        lambda acc, e: acc + (e["p"]["x"] * e["q"]["y"]
                              - e["q"]["x"] * e["p"]["y"]))


# ------------------------------------------------------------ SQL twin

def _sql_edges(ring: str) -> str:
    return (f"list_zip({ring}, "
            f"({ring})[2:] || ({ring})[1:1])")


def _sql_clip_half(ring: str, axis: str, bound,
                   keep_ge: bool) -> str:
    """``bound`` may be a number or a SQL expression string (a column
    reference for per-row tile bounds)."""
    b = bound if isinstance(bound, str) else repr(float(bound))
    op = ">=" if keep_ge else "<="

    def inside(pt):
        return f"({pt}.{axis} {op} {b})"

    if axis == "x":
        inter = (f"struct_pack(x := {b}, y := e[1].y + "
                 f"({b} - e[1].x) / (e[2].x - e[1].x) "
                 f"* (e[2].y - e[1].y))")
    else:
        inter = (f"struct_pack(x := e[1].x + "
                 f"({b} - e[1].y) / (e[2].y - e[1].y) "
                 f"* (e[2].x - e[1].x), y := {b})")
    per_edge = (f"[CASE WHEN {inside('e[1]')} "
                f"!= {inside('e[2]')} THEN {inter} END, "
                f"CASE WHEN {inside('e[2]')} THEN e[2] END]")
    return (f"list_filter(flatten(list_transform({_sql_edges(ring)}, "
            f"e -> {per_edge})), s -> s IS NOT NULL)")


def sql_clip_to_rect(ring: str, xmin, ymin, xmax, ymax) -> str:
    r = _sql_clip_half(ring, "x", xmin, True)
    r = _sql_clip_half(r, "x", xmax, False)
    r = _sql_clip_half(r, "y", ymin, True)
    r = _sql_clip_half(r, "y", ymax, False)
    return r


def sql_ring_area2(ring: str) -> str:
    return (f"list_reduce([0.0] || list_transform({_sql_edges(ring)}, "
            f"e -> e[1].x * e[2].y - e[2].x * e[1].y), "
            f"(a, b) -> a + b)")
