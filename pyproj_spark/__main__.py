"""CLI entry point — mirrors the reference ``pyproj/__main__.py``:

    python -m pyproj_spark            # version banner
    python -m pyproj_spark -v         # verbose environment report
    python -m pyproj_spark sync --list-files [--bbox ...] [--source-id ..]

``sync --all`` downloads matching grids via
``sync._download_resource_file`` (reference __main__.py:156-199) when
the ``pyproj_spark.network`` toggle is ON; with networking disabled it
prints the library's guidance and exits 1. The sandbox cannot reach the
real PROJ CDN, so tests exercise the download path via localhost HTTP.
"""

from __future__ import annotations

import argparse

from pyproj_spark import __version__
from pyproj_spark.aoi import BBox
from pyproj_spark.sync import get_transform_grid_list

parser = argparse.ArgumentParser(
    description=f"pyproj_spark version: {__version__} "
                "[PySpark-native engine]")
parser.add_argument(
    "-v", "--verbose", action="store_true",
    help="Show verbose debugging version information.")
subparsers = parser.add_subparsers(title="commands")
sync_parser = subparsers.add_parser(
    name="sync",
    description="Tool for listing datum/transformation grid resources.")
sync_parser.add_argument(
    "--bbox", help="west_long,south_lat,east_long,north_lat area filter.")
sync_parser.add_argument(
    "--spatial-test", choices=["intersects", "contains"],
    default="intersects",
    help="How grid extents are compared to --bbox.")
sync_parser.add_argument(
    "--source-id", help="Filter by source_id property.")
sync_parser.add_argument(
    "--area-of-use", help="Filter by area_of_use property.")
sync_parser.add_argument(
    "--file", help="Filter by file name.")
sync_parser.add_argument(
    "--exclude-world-coverage", action="store_true",
    help="Exclude files which have world coverage.")
sync_parser.add_argument(
    "--include-already-downloaded", action="store_true",
    help="Include grids that are already registered.")
sync_parser.add_argument(
    "--list-files", action="store_true",
    help="List the matching grid files.")
sync_parser.add_argument(
    "--all", action="store_true",
    help="Download all matching grid files (requires networking "
         "enabled via PROJ_NETWORK=ON or set_network_enabled).")
sync_parser.add_argument(
    "--directory",
    help="Directory to download geojson/grid files to. Default is the "
         "user writable directory.")
sync_parser.add_argument(
    "--verbose", action="store_true",
    help="Print download URLs.")
sync_parser.set_defaults(_cmd="sync")


def _show_versions(verbose: bool) -> str:
    import sys

    import numpy
    import pyspark

    lines = [f"pyproj_spark: {__version__}",
             f"pyspark:      {pyspark.__version__}",
             f"numpy:        {numpy.__version__}",
             f"python:       {sys.version.split()[0]}"]
    if verbose:
        from pyproj_spark.crs import catalog
        from pyproj_spark.kernels.grids import _GRIDS
        from pyproj_spark.kernels.projections import PROJECTIONS
        lines += [
            f"EPSG codes:   {len(catalog.all_codes())} bundled",
            f"projections:  {', '.join(sorted(set(PROJECTIONS)))}",
            f"grids:        {', '.join(sorted(_GRIDS)) or '(none)'}",
        ]
    return "\n".join(lines)


def _parse_sync(args) -> int:
    bbox = None
    if args.bbox:
        w, s, e, n = (float(v) for v in args.bbox.split(","))
        bbox = BBox(west=w, south=s, east=e, north=n)
    feats = get_transform_grid_list(
        source_id=args.source_id, area_of_use=args.area_of_use,
        filename=args.file, bbox=bbox, spatial_test=args.spatial_test,
        include_world_coverage=not args.exclude_world_coverage,
        include_already_downloaded=args.include_already_downloaded)
    if args.all and feats:
        from pyproj_spark.network import is_network_enabled
        from pyproj_spark.sync import _download_resource_file
        if not is_network_enabled():
            print("networking is disabled; enable with PROJ_NETWORK=ON "
                  "or pyproj_spark.network.set_network_enabled(True) "
                  "(offline alternative: pyproj_spark.kernels.grids."
                  "register_grid)")
            return 1
        for f in feats:
            p = f["properties"]
            _download_resource_file(
                file_url=p["url"], short_name=p["name"],
                directory=args.directory, verbose=args.verbose,
                sha256=p.get("sha256sum"))
        return 0
    for f in feats:
        p = f["properties"]
        print(f"{p['name']:45s} {p['source_id']:10s} {p['area_of_use']}")
    return 0


def main(argv=None) -> int:
    args = parser.parse_args(argv)
    if getattr(args, "_cmd", None) == "sync":
        if not any((args.bbox, args.list_files, args.all, args.source_id,
                    args.area_of_use, args.file)):
            sync_parser.print_help()
            return 0
        return _parse_sync(args)
    print(_show_versions(args.verbose))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
