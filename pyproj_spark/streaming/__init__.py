"""Structured Streaming operators.

The reference is purely batch (pyproj has no streaming surface —
SURVEY.md §2.3), so this module is graft-added capability: incremental
tile materialization over a stream of pages, with event-time windows +
watermarks for late data.
"""
