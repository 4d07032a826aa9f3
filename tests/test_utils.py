"""Container round-trip utilities — ported from reference
test/test_utils.py (xarray/dask cases skipped: libs absent by design)
plus the Transformer-facade container contract the utilities exist
for."""

from array import array

import numpy
import pytest

from pyproj_spark.utils import (DataType, NumpyEncoder, _convertback,
                                _copytobuffer,
                                _copytobuffer_return_scalar, is_null,
                                strtobool)


@pytest.mark.parametrize("in_data", [numpy.array(1), 1])
def test_copytobuffer_return_scalar(in_data):
    arr, dt = _copytobuffer_return_scalar(in_data)
    assert dt == DataType.FLOAT
    assert list(arr) == [1.0]


def test_copytobuffer_return_scalar_invalid():
    with pytest.raises(TypeError):
        _copytobuffer_return_scalar("invalid")


@pytest.mark.parametrize(
    "in_data, data_type",
    [
        (numpy.array(1), DataType.FLOAT),
        (1, DataType.FLOAT),
        ([1], DataType.LIST),
        ((1,), DataType.TUPLE),
        (array("d", [1]), DataType.STDLIB_ARRAY),
    ],
)
def test_copytobuffer(in_data, data_type):
    arr, dt = _copytobuffer(in_data)
    assert dt == data_type
    assert list(arr) == [1.0]


def test_copytobuffer_stdlib_array_copies_and_roundtrips():
    """The buffer must NOT alias the caller's array (reference
    utils.py always copies unless inplace), and convertback must
    restore array('d') (reference utils.py:131-133)."""
    src = array("d", [1.0, 2.0])
    buf, dt = _copytobuffer(src)
    buf[0] = 99.0
    assert list(src) == [1.0, 2.0]
    back = _convertback(dt, buf)
    assert isinstance(back, array) and back.typecode == "d"
    assert list(back) == [99.0, 2.0]


def test_copytobuffer_pandas_series():
    import pandas
    arr, dt = _copytobuffer(pandas.Series([1.0, 2.0]))
    assert dt == DataType.ARRAY
    assert list(arr) == [1.0, 2.0]


def test_copytobuffer_masked_array_keeps_mask():
    in_arr = numpy.ma.array([1.0, 2.0], mask=[False, True])
    out, dt = _copytobuffer(in_arr)
    assert dt == DataType.ARRAY
    assert isinstance(out, numpy.ma.MaskedArray)
    assert list(out.mask) == [False, True]


def test_copytobuffer_fortran_order_to_c():
    f = numpy.asfortranarray(numpy.array([[1.0, 2.0], [3.0, 4.0]]))
    out, _ = _copytobuffer(f)
    assert out.flags.c_contiguous


@pytest.mark.parametrize(
    "dt, expected",
    [
        (DataType.FLOAT, 1.0),
        (DataType.LIST, [1.0]),
        (DataType.TUPLE, (1.0,)),
    ],
)
def test_convertback(dt, expected):
    got = _convertback(dt, numpy.array([1.0]))
    assert got == expected
    assert type(got) is type(expected)


def test_is_null():
    assert is_null(None)
    assert is_null(float("nan"))
    assert not is_null(0.0)


@pytest.mark.parametrize("v,b", [("YES", True), ("on", True),
                                 ("1", True), ("f", False),
                                 ("off", False), ("0", False)])
def test_strtobool(v, b):
    assert strtobool(v) is b


def test_strtobool_invalid():
    with pytest.raises(ValueError):
        strtobool("maybe")


def test_numpy_encoder():
    import json
    s = json.dumps({"a": numpy.array([1.0, 2.0]),
                    "b": numpy.float64(3.5),
                    "c": numpy.int64(4)}, cls=NumpyEncoder)
    assert json.loads(s) == {"a": [1.0, 2.0], "b": 3.5, "c": 4}


def test_transformer_container_roundtrip():
    """list -> list, tuple -> tuple, scalar/0-d -> scalar — reference
    transformer behavior via utils._convertback."""
    from pyproj_spark.plans.spec import Transformer
    t = Transformer.from_crs("EPSG:4326", "EPSG:3857", always_xy=True)
    xs, ys = t.transform([0.0, 1.0], [0.0, 1.0])
    assert isinstance(xs, list) and isinstance(ys, list)
    xs, ys = t.transform((0.0, 1.0), (0.0, 1.0))
    assert isinstance(xs, tuple) and isinstance(ys, tuple)
    x, y = t.transform(0.0, 0.0)
    assert isinstance(x, float) and isinstance(y, float)
    x, y = t.transform(numpy.array(1.0), numpy.array(2.0))
    assert isinstance(x, float) and isinstance(y, float)
    xs, ys = t.transform(numpy.array([1.0]), numpy.array([2.0]))
    assert isinstance(xs, numpy.ndarray)
    import pandas
    xs, ys = t.transform(pandas.Series([1.0]), pandas.Series([2.0]))
    assert isinstance(xs, numpy.ndarray)
