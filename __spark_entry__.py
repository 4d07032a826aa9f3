"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship query — deterministic geo points derived from the
sf0.001 documents table are CRS-transformed to EPSG:3857 through the
vectorized pandas-UDF kernel, geocell-encoded + slippy-tiled natively,
and aggregated per tile (the "transformed-and-tiled pages/sec" unit of
BASELINE.json).

queries()/oracle_sql(): the full operator surface from SURVEY.md §2 —
see pyproj_spark/queries.py (geo + relational) and
pyproj_spark/queries_text.py (dedup/similarity/text analysis).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# import-safe regardless of the harness cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transform + cell-encode + tile the sf0.001 points."""
    from pyspark.sql import functions as F

    from pyproj_spark.functions import cells
    from pyproj_spark.functions.tiles import tile_xy
    from pyproj_spark.functions.transform import transform_xy
    from pyproj_spark.queries import _doc_points

    pts = _doc_points(spark, "/root/testdata/sf0.001")
    xy = transform_xy("EPSG:4326", "EPSG:3857", F.col("lon"), F.col("lat"))
    pts = pts.withColumn("xy", xy)
    tx, ty = tile_xy(F.col("xy.x"), F.col("xy.y"), 8)
    return (pts
            .withColumn("cell", cells.cell_of(F.col("lon"), F.col("lat"),
                                              cells.DEFAULT_RES))
            .withColumn("tx", tx).withColumn("ty", ty)
            .groupBy("tx", "ty")
            .agg(F.count("*").alias("n_points"),
                 F.countDistinct("cell").alias("n_cells"))
            .orderBy("tx", "ty"))


def _last_sampled_round() -> dict[str, int]:
    """name -> the latest round whose driver CORRECTNESS_r*.json
    sampled it (0 if never). Reads the artifacts the driver leaves in
    the repo root, so the ordering is deterministic given the repo
    state and needs no per-round editing."""
    import glob
    import json
    import re
    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(rec, dict):
            for name in rec:
                last[name] = max(last.get(name, 0), rnd)
    return last


def _interleaved() -> dict[str, tuple]:
    """Registration order = driver-sample priority (the driver checks
    a bounded ~50-query prefix):

    1. queries ADDED OR CHANGED this round — highest-risk surface,
       must land inside the sample;
    2. everything else, LEAST-RECENTLY-DRIVER-SAMPLED first
       (never-sampled queries lead), so the sample window cycles
       through the whole registry across rounds instead of permanently
       shadowing mid-list queries (61 of 170 had never been
       driver-checked through r4)."""
    from pyproj_spark.queries import QUERIES
    from pyproj_spark.queries_text import QUERIES_TEXT
    merged = dict(QUERIES)
    merged.update(QUERIES_TEXT)
    new_this_round = [
        # tenth-session additions (newest first)
        "quadrat_csr", "solar_position", "knox_test",
        "bib_coupling", "jsonld_extract", "meta_robots",
        "skyline", "cell_mad", "feed_parse",
        "cost_distance", "harmonic_centrality", "idw_loocv",
        "assortativity", "ndcg_eval", "pca_power",
        "local_moran", "cusum_drift", "term_burstiness",
        "quadkey_compact", "ks_interarrival", "gini_hosts",
        "soundex_blocking", "geo_median",
        "hapax_ratio", "heaps_fit", "raster_upsample",
        "clark_evans", "hill_alpha", "lang_entropy",
        "variogram", "toc_extract",
        "kendall_tau", "sitemap_discovery", "email_deobfuscate",
        "benford", "two_prop_test", "dem_curvature",
        "runs_test", "nearest_facility", "two_sfca",
        "raster_hist_eq", "chi2_features", "stylometry_delta",
        "cell_turnover", "coverage_curve",
        # ninth-session additions (newest first)
        "geary_c", "ripley_k", "salsa", "kneser_ney", "flow_accum",
        "frechet", "watershed", "kde_raster", "flow_length",
        "vw_filter", "good_turing", "rrf_fusion", "sorted_neighborhood",
        "textrank", "pq_ann", "ivfpq",  # changed this session
        "theil_sen", "terrain_tpi", "world_proj", "hammer_aitoff",
        "focal_mode", "zone_diameter", "sinuosity", "std_ellipse",
        "itrf_epoch",
        "hillshade", "viewshed", "textrank", "posting_lists",
        "url_templates", "kmv_sketch", "bot_score", "fetch_budget",
        "geom_valid", "link_reciprocity", "concurrency",
        "polyline_encode", "haar_raster", "gravity_flows",
        "molodensky", "hilbert", "mime_sniff", "surt_dedup", "mojibake", "hreflang_cluster", "flow_dir",
        "rect_join", "union_area", "speed_filter", "line_interp",
        "cdc_chunks", "sitemap_parse", "readability", "rake_keywords",
        "ngram_novelty", "dem_slope", "dtw_route", "jl_project",
        "image_dhash", "range_join", "audio_fp", "quality_auc",
        "symspell_pairs", "resample_track", "anchor_text",
        "corpus_drift", "zonal_stats", "sph_centroid",
        "rhumb_line", "dsir_sample", "gc_intersect", "sq8_ann",
        "hmm_match", "pq_ann", "ivfpq", "colocate", "fertility",
        "rd_grid", "gauss_kruger", "krovak_grid", "hll_pyramid", "geoip",
        "vertical_shift", "nad27_stateplane",
        # (semdedup/bpe_merges/bpe_segment/kcore/hop_distance/
        # label_prop/shortest_path/hll_pyramid already driver-sampled
        # in r4 — dropped from the priority head so every
        # never-sampled query fits the ~50-query prefix window; they
        # rotate back in via the least-recently-sampled ordering.)
    ]
    out: dict[str, tuple] = {n: merged[n] for n in new_this_round
                             if n in merged}
    last = _last_sampled_round()
    rest = sorted((n for n in merged if n not in out),
                  key=lambda n: (last.get(n, 0), n))
    for n in rest:
        out[n] = merged[n]
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _interleaved().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (fn, sql) in _interleaved().items()
            if sql is not None}
