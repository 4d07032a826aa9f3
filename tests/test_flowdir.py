"""D8 flow direction: output-level invariants checked by replaying the
pointed-at neighbour from the result itself — direction codes are
valid, the flow target exists, is strictly lower, reproduces the
weighted drop score, and beats (or ties with a larger code than)
every other neighbour; pits have no lower neighbour."""

from __future__ import annotations

import pytest

from pyproj_spark.queries import _D8, q_flow_dir

SF = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def cells(spark):
    pdf = q_flow_dir(spark, SF).toPandas()
    z = {(int(r.tx), int(r.ty)): int(r.z) for r in pdf.itertuples()}
    return pdf, z


OFF = {code: (ox, oy) for ox, oy, code in _D8}
W = {code: (10 if ox * oy == 0 else 7) for ox, oy, code in _D8}


def test_codes_valid(cells):
    pdf, _ = cells
    assert set(pdf["d8"]).issubset({0} | set(OFF))


def test_flow_target_lower_and_score_exact(cells):
    pdf, z = cells
    flowing = pdf[pdf["d8"] != 0]
    assert len(flowing) > 0
    for r in flowing.itertuples():
        ox, oy = OFF[int(r.d8)]
        tgt = (int(r.tx) + ox, int(r.ty) + oy)
        assert tgt in z, (r.tx, r.ty, r.d8)       # target occupied
        drop = (int(r.z) - z[tgt]) * W[int(r.d8)]
        assert drop == int(r.drop_score) and drop > 0


def test_direction_is_argmax_with_smallest_code_tiebreak(cells):
    pdf, z = cells
    for r in pdf.itertuples():
        best = 0
        best_code = 0
        for code, (ox, oy) in OFF.items():
            tgt = (int(r.tx) + ox, int(r.ty) + oy)
            if tgt not in z:
                continue
            s = (int(r.z) - z[tgt]) * W[code]
            if s > best or (s == best and s > 0 and code < best_code):
                best, best_code = s, code
        assert (int(r.d8), int(r.drop_score)) == \
            ((best_code if best > 0 else 0), max(best, 0)), \
            (r.tx, r.ty)


def test_pits_have_no_lower_neighbour(cells):
    pdf, z = cells
    pits = pdf[pdf["d8"] == 0]
    for r in pits.itertuples():
        for code, (ox, oy) in OFF.items():
            tgt = (int(r.tx) + ox, int(r.ty) + oy)
            if tgt in z:
                assert z[tgt] >= int(r.z)


def test_flow_accum_conserves_and_orders(spark):
    """Basin conservation: every cell's path ends at exactly one pit,
    so sum over pits of (acc + 1) = total cells; and accumulation is
    monotone along flow (acc(target) >= acc(source) + 1)."""
    from pyproj_spark.queries import q_flow_accum
    pdf = q_flow_accum(spark, SF).toPandas()
    acc = {(int(r.tx), int(r.ty)): int(r.acc) for r in pdf.itertuples()}
    pits = pdf[pdf["d8"] == 0]
    assert (pits["acc"] + 1).sum() == len(pdf)
    for r in pdf[pdf["d8"] > 0].itertuples():
        ox, oy = OFF[int(r.d8)]
        assert acc[(int(r.tx) + ox, int(r.ty) + oy)] >= int(r.acc) + 1
    assert pdf["acc"].max() > 0  # a non-trivial network formed


def test_watershed_labels_are_pits_and_flow_consistent(spark):
    from pyproj_spark.queries import q_flow_dir, q_watershed
    fd = {(int(r.tx), int(r.ty)): int(r.d8)
          for r in q_flow_dir(spark, SF).collect()}
    ws = {(int(r.tx), int(r.ty)): (int(r.btx), int(r.bty))
          for r in q_watershed(spark, SF).collect()}
    assert set(ws) == set(fd)
    for cell, basin in ws.items():
        assert fd[basin] == 0, (cell, basin)  # label IS a pit
        d8 = fd[cell]
        if d8 > 0:  # flowing into your neighbour = same basin
            ox, oy = OFF[d8]
            assert ws[(cell[0] + ox, cell[1] + oy)] == basin
        else:
            assert basin == cell  # pits label themselves


def test_flow_length_telescopes_along_flow(spark):
    """flow_len(cell) = step_weight(cell) + flow_len(target); pits 0."""
    from pyproj_spark.queries import q_flow_dir, q_flow_length
    fd = {(int(r.tx), int(r.ty)): int(r.d8)
          for r in q_flow_dir(spark, SF).collect()}
    fl = {(int(r.tx), int(r.ty)): int(r.flow_len)
          for r in q_flow_length(spark, SF).collect()}
    assert set(fl) == set(fd)
    for cell, d8 in fd.items():
        if d8 == 0:
            assert fl[cell] == 0, cell
        else:
            ox, oy = OFF[d8]
            w = 10 if d8 in (1, 4, 16, 64) else 7
            assert fl[cell] == w + fl[(cell[0] + ox, cell[1] + oy)], cell
