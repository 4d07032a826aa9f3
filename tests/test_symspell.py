"""SymSpell deletion-neighborhood blocking: exact-recall contract.

The operator claims EVERY pair within Levenshtein distance 1 is found
(symmetric-delete completeness). The fixture plants edits at the FIRST
character — the case prefix blocking misses — plus insertions,
deletions, identical twins, and distance-2 decoys that must NOT appear.
"""

import itertools


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


TITLES = [
    (0, "spark engine"),
    (1, "xpark engine"),      # first-char substitution of 0
    (2, "park engine"),       # first-char deletion of 0
    (3, "spark enginee"),     # trailing insertion of 0
    (4, "spark engine"),      # identical twin of 0
    (5, "spork enginee"),     # distance 2 from 0 — must NOT pair with 0
    (6, "zzz"),               # isolated
    (7, "a"),                 # single char
    (8, ""),                  # empty string edge
    (9, "b"),                 # lev("a","b")=1, lev("","a")=1
]


def test_symspell_matches_bruteforce(spark):
    from pyproj_spark.operators.dedup import symspell_pairs
    df = spark.createDataFrame(TITLES, "doc_id long, title string")
    got = {(r.doc_a, r.doc_b, r.dist)
           for r in symspell_pairs(df).collect()}
    want = {(a, b, _lev(ta, tb))
            for (a, ta), (b, tb) in itertools.combinations(TITLES, 2)
            if _lev(ta, tb) <= 1}
    assert got == want
    assert (0, 1, 1) in got          # first-char edit recovered
    assert (0, 4, 0) in got          # exact twin at distance 0
    assert not any(a == 0 and b == 5 for a, b, _ in got)  # dist-2 decoy
