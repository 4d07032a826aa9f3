"""Deterministic synthetic sources (pages, zones) + parquet readers.

All generators are pure functions of (seed, n_rows) — no wall clock, no
unseeded RNG — so re-runs and the N-vs-4N parallelism bench see
byte-identical inputs (FIXTURES.md contract).
"""
