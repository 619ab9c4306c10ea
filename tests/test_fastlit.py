"""Round-14 internals pin: the one-py4j-call literal arrays
(ops/similarity.lit_double_array / lit_int_array) must be BIT-identical —
values and schema — to the element-wise F.lit construction they replaced.

The element-wise path (pyspark's own ``lit(list)`` recursion) costs one
driver round trip per element; profiling round 14 showed it dominating
plan-construction wall for the literal-heavy ANN family (a 16x64 centroid
matrix is ~1k round trips per query build).  The replacement renders the
array as ONE ``F.expr`` string; ``repr(float)`` round-trips exactly
through Java's correctly-rounded ``Double.parseDouble``, so the parsed
literals carry the same bits.  ``DAGGER_FASTLIT=0`` selects the old path
(the measurement kill switch the round-14 A/B used).
"""

import math
import os
import struct

from dagger_spark.ops.similarity import (
    _plane_coeffs,
    lit_double_array,
    lit_int_array,
    rp_signs,
)


def _bits(x):
    if isinstance(x, list):
        return [_bits(v) for v in x]
    return struct.pack("<d", x).hex()


def _both(spark, builder):
    fast = spark.range(1).select(builder().alias("v"))
    os.environ["DAGGER_FASTLIT"] = "0"
    try:
        slow = spark.range(1).select(builder().alias("v"))
    finally:
        os.environ.pop("DAGGER_FASTLIT", None)
    return fast, slow


def test_double_array_bit_parity(spark):
    vals = (
        _plane_coeffs(3, 64)
        + [math.sqrt(sum(x * x for x in _plane_coeffs(1, 64)))]
        + [0.0, -0.0, 1e-17, 123456789.123456789, 2.5e-308]
    )
    fast, slow = _both(spark, lambda: lit_double_array(vals))
    assert str(fast.schema) == str(slow.schema)
    f = [float(x) for x in fast.head()["v"]]
    s = [float(x) for x in slow.head()["v"]]
    assert _bits(f) == _bits(s)


def test_nested_double_array_bit_parity(spark):
    mat = [_plane_coeffs(p, 8) for p in range(4)]
    cube = [[rp_signs(j, 4) for j in range(3)] for _ in range(2)]
    for payload in (mat, cube):
        fast, slow = _both(spark, lambda: lit_double_array(payload))
        assert str(fast.schema) == str(slow.schema)

        def unpack(v):
            return [unpack(x) for x in v] if hasattr(v, "__iter__") else float(v)

        assert _bits(unpack(list(fast.head()["v"]))) == _bits(
            unpack(list(slow.head()["v"]))
        )


def test_int_array_type_and_value_parity(spark):
    vals = [0, 1, 15, 2**31 - 1, -5]
    fast, slow = _both(spark, lambda: lit_int_array(vals))
    assert str(fast.schema) == str(slow.schema)  # array<int>, not bigint
    assert list(fast.head()["v"]) == list(slow.head()["v"]) == vals


def test_string_array_escape_round_trip(spark):
    from dagger_spark.ops.similarity import lit_string_array

    vals = [
        "plain", "it's", 'say "hi"', "back\\slash", "two\\\\", r"mix\'q",
        "tab\there", "new\nline", "semi;colon--", "unié中",
        "pct%_", "", "'", "\\", "a,b", ")(", "${x}",
    ]
    fast, slow = _both(spark, lambda: lit_string_array(vals))
    assert str(fast.schema) == str(slow.schema)
    assert list(fast.head()["v"]) == list(slow.head()["v"]) == vals
