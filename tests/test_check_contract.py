"""The contract-check mimic must be dtype-faithful (VERDICT r3 items 1-2).

The driver's value hash renders floats as floats: an oracle column that
reaches pandas as float64 must hash differently from Spark's int64 even
when every value is integral (1.0 vs 1).  The old mimic collapsed integral
floats to ints and masked exactly that divergence for three rounds.
"""

import sys
import os

import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from check_contract import normalize, dtype_kinds  # noqa: E402


def test_integral_float_hashes_differently_from_int():
    ints = pd.DataFrame({"session_id": pd.array([1, 2, 3], dtype="int64")})
    floats = pd.DataFrame({"session_id": pd.array([1.0, 2.0, 3.0], dtype="float64")})
    hi, ni, _ = normalize(ints)
    hf, nf, _ = normalize(floats)
    assert ni == nf == 3
    assert hi != hf, "integral floats must NOT collapse to ints in the hash"


def test_dtype_kind_mismatch_detected():
    ints = pd.DataFrame({"a": pd.array([1], dtype="int64"), "b": ["x"]})
    floats = pd.DataFrame({"a": pd.array([1.0], dtype="float64"), "b": ["x"]})
    assert dtype_kinds(ints) != dtype_kinds(floats)
    assert dtype_kinds(ints)["a"] == "i"
    assert dtype_kinds(floats)["a"] == "f"


def test_dtype_kind_folds_unsigned_and_width():
    a = pd.DataFrame({"a": pd.array([1], dtype="int32")})
    b = pd.DataFrame({"a": pd.array([1], dtype="uint64")})
    # width/signedness differences render identically under the driver hash,
    # so they must NOT trip the kind check
    assert dtype_kinds(a) == dtype_kinds(b)


def test_float_repr_is_full_precision():
    df = pd.DataFrame({"a": [0.1234567890123]})
    h, _, _ = normalize(df)
    df2 = pd.DataFrame({"a": [0.1234567890124]})
    h2, _, _ = normalize(df2)
    assert h != h2
