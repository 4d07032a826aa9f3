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


def _bind(col: Column, fn) -> Column:
    """Evaluate ``col`` once and feed it to ``fn`` as a HOF lambda
    variable (the hexcell/s2cell r6 binding idiom). Chained clip
    passes reference their input ~3x each (ring + two slices in
    _edges); inlined, four passes balloon to ~3^4 copies of the
    subject expression — a multi-hundred-KB plan whose interpreted
    HOF evaluation repeats every copy per row. Bound, each pass's
    tree appears (and evaluates) exactly once. Same arithmetic."""
    return F.element_at(F.transform(F.array(col), fn), 1)


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
    """Ring clipped to [xmin,xmax]x[ymin,ymax]; possibly empty.
    Each pass's output is BOUND (evaluated once) before feeding the
    next — identical float ops, linear instead of ~3^4 tree size."""
    r = _clip_half(ring, "x", xmin, True)
    r = _bind(r, lambda rr: _clip_half(rr, "x", xmax, False))
    r = _bind(r, lambda rr: _clip_half(rr, "y", ymin, True))
    r = _bind(r, lambda rr: _clip_half(rr, "y", ymax, False))
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


# --------------------------------------------- general (concave) clip
#
# Sutherland-Hodgman only accepts a CONVEX clip window; the graft's
# raster<->vector surface also needs concave zone CLIP regions
# (admin boundaries). The exact intersection AREA of two arbitrary
# simple polygons decomposes, without any traversal, into fan
# triangles of the clip ring:
#
#   2*area(P & Q) = sum_i s_i * area2( SH(P, T_i) ),
#   T_i = (q_0, q_i, q_{i+1}),  s_i = orientation sign of T_i
#
# (the signed-fan identity behind the shoelace formula, lifted from
# points to regions). Each T_i is a triangle -- convex -- so three
# general-half-plane Sutherland-Hodgman passes per term suffice, and
# everything stays in Catalyst array HOFs with a DuckDB twin below.
# Concave SUBJECTS are fine: SH against a convex window emits
# boundary "bridge" edges whose shoelace contributions cancel.


def _clip_half_line(ring: Column, ax, ay, bx, by, s) -> Column:
    """One SH pass keeping points p with s*cross(b-a, p-a) >= 0
    (s=+1: left of the directed line a->b; s=-1: right)."""
    def side(pt):
        return ((bx - ax) * (pt["y"] - ay)
                - (by - ay) * (pt["x"] - ax)) * s

    def inside(pt):
        return side(pt) >= 0

    def inter(p, q):
        t = side(p) / (side(p) - side(q))
        return F.struct((p["x"] + t * (q["x"] - p["x"])).alias("x"),
                        (p["y"] + t * (q["y"] - p["y"])).alias("y"))

    def per_edge(e):
        p, q = e["p"], e["q"]
        cross = inside(p) != inside(q)
        return F.array(F.when(cross, inter(p, q)),
                       F.when(inside(q), q))

    out = F.flatten(F.transform(_edges(ring), per_edge))
    return F.filter(out, lambda x: x.isNotNull())


def clip_to_triangle(ring: Column, x0, y0, x1, y1, x2, y2,
                     s) -> Column:
    """Ring clipped to the triangle (x0,y0)-(x1,y1)-(x2,y2) of
    orientation sign ``s`` (+1 CCW / -1 CW)."""
    r = _clip_half_line(ring, x0, y0, x1, y1, s)
    r = _bind(r, lambda rr: _clip_half_line(rr, x1, y1, x2, y2, s))
    r = _bind(r, lambda rr: _clip_half_line(rr, x2, y2, x0, y0, s))
    return r


def ccw(ring: Column) -> Column:
    """Ring oriented counter-clockwise (reversed if shoelace < 0)."""
    return F.when(ring_area2(ring) < 0, F.reverse(ring)) \
        .otherwise(ring)


def intersection_area2(subj: Column, clip: Column) -> Column:
    """Twice the area of subj & clip for ARBITRARY simple polygons
    (either may be concave). ``subj`` must already be CCW-oriented
    (apply :func:`ccw` once in a prior projection — inlining it here
    would replicate its expression tree into every SH pass).
    Deterministic left-fold summation."""
    c0 = F.element_at(clip, 1)

    def contrib(i):
        ci = F.element_at(clip, i.cast("int"))
        cj = F.element_at(clip, (i + 1).cast("int"))
        cross2 = ((ci["x"] - c0["x"]) * (cj["y"] - c0["y"])
                  - (ci["y"] - c0["y"]) * (cj["x"] - c0["x"]))
        s = F.when(cross2 > 0, F.lit(1.0)) \
            .when(cross2 < 0, F.lit(-1.0)).otherwise(F.lit(0.0))
        tri = clip_to_triangle(subj, c0["x"], c0["y"], ci["x"],
                               ci["y"], cj["x"], cj["y"], s)
        # bind the clipped triangle before the shoelace fold:
        # ring_area2 references its argument 3x via _edges
        return s * _bind(tri, ring_area2)

    terms = F.transform(F.sequence(F.lit(2), F.size(clip) - 1),
                        contrib)
    total = F.aggregate(terms, F.lit(0.0), lambda a, b: a + b)
    # sign of the total is the clip ring's orientation; P&Q area is
    # orientation-free
    return F.abs(total)


def _sql_side(pt: str, ax: str, ay: str, bx: str, by: str,
              s: str) -> str:
    return (f"((({bx}) - ({ax})) * ({pt}.y - ({ay})) "
            f"- (({by}) - ({ay})) * ({pt}.x - ({ax}))) * ({s})")


def _sql_clip_half_line(ring: str, ax: str, ay: str, bx: str,
                        by: str, s: str) -> str:
    def inside(pt):
        return f"({_sql_side(pt, ax, ay, bx, by, s)} >= 0)"

    dp = _sql_side("e[1]", ax, ay, bx, by, s)
    dq = _sql_side("e[2]", ax, ay, bx, by, s)
    t = f"(({dp}) / (({dp}) - ({dq})))"
    inter = (f"struct_pack(x := e[1].x + {t} * (e[2].x - e[1].x), "
             f"y := e[1].y + {t} * (e[2].y - e[1].y))")
    per_edge = (f"[CASE WHEN {inside('e[1]')} != {inside('e[2]')} "
                f"THEN {inter} END, "
                f"CASE WHEN {inside('e[2]')} THEN e[2] END]")
    return (f"list_filter(flatten(list_transform({_sql_edges(ring)}, "
            f"e -> {per_edge})), x -> x IS NOT NULL)")


def sql_ccw(ring: str) -> str:
    return (f"CASE WHEN {sql_ring_area2(ring)} < 0 "
            f"THEN list_reverse({ring}) ELSE {ring} END")


def sql_clip_to_triangle(ring: str, x0: str, y0: str, x1: str,
                         y1: str, x2: str, y2: str, s: str) -> str:
    r = _sql_clip_half_line(ring, x0, y0, x1, y1, s)
    r = _sql_clip_half_line(r, x1, y1, x2, y2, s)
    r = _sql_clip_half_line(r, x2, y2, x0, y0, s)
    return r


def sql_intersection_area2(subj: str, clip: str) -> str:
    """DuckDB twin of :func:`intersection_area2`. ``subj``/``clip``
    should be plain column references (both are inlined repeatedly);
    ``subj`` must already be CCW-oriented (see :func:`sql_ccw`)."""
    c0x, c0y = f"{clip}[1].x", f"{clip}[1].y"
    cix, ciy = f"{clip}[i].x", f"{clip}[i].y"
    cjx, cjy = f"{clip}[i + 1].x", f"{clip}[i + 1].y"
    cross2 = (f"(({cix} - {c0x}) * ({cjy} - {c0y}) "
              f"- ({ciy} - {c0y}) * ({cjx} - {c0x}))")
    s = (f"(CASE WHEN {cross2} > 0 THEN 1.0 "
         f"WHEN {cross2} < 0 THEN -1.0 ELSE 0.0 END)")
    tri = sql_clip_to_triangle(subj, c0x, c0y, cix, ciy, cjx, cjy, s)
    contrib = f"{s} * ({sql_ring_area2(tri)})"
    terms = (f"list_transform(range(2, len({clip})), "
             f"i -> {contrib})")
    return (f"abs(list_reduce([0.0] || {terms}, (a, b) -> a + b))")
