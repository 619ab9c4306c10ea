"""mapInArrow plumbing pinned by an exact-integer differential: the Arrow
kernel and the JVM transform/aggregate expression must agree EXACTLY (both
compute order-free int64 sums over identically-quantized elements)."""

import pytest
from pyspark.sql import Row

from dagger_spark.ops.arrow import sq_norms_arrow, sq_norms_expr
from dagger_spark.sources.files import load_table


def test_arrow_kernel_equals_jvm_expression(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    got = {r["vec_id"]: (r["dim"], r["sq_norm_micro"])
           for r in sq_norms_arrow(emb).collect()}
    want = {r["vec_id"]: (r["dim"], r["sq_norm_micro"])
            for r in sq_norms_expr(emb).collect()}
    assert got == want
    assert len(got) == emb.count()
    assert all(d == 64 and s > 0 for d, s in got.values())


def test_arrow_kernel_edge_vectors(spark):
    """Zero-length vectors sum to 0 (the reduceat trap), exact .5
    boundaries quantize identically to the SQL floor(+0.5) form, and
    negatives square positive."""
    rows = [
        Row(vec_id=1, embedding=[0.5, -0.5]),       # 500000² + 500000²
        Row(vec_id=2, embedding=[]),                # zero-length window
        Row(vec_id=3, embedding=[-0.0000005]),      # floor(-0.5+0.5) = 0
        Row(vec_id=4, embedding=[0.0000005]),       # floor(0.5+0.5) = 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: (r["dim"], r["sq_norm_micro"])
           for r in sq_norms_arrow(df).collect()}
    want = {r["vec_id"]: (r["dim"], r["sq_norm_micro"])
            for r in sq_norms_expr(df).collect()}
    assert got == want
    assert got[1] == (2, 2 * 500_000 * 500_000)
    assert got[2] == (0, 0)


def test_arrow_kernel_null_vectors_pass_through_as_null(spark):
    """NULL vectors yield NULL dim/sum — the same SQL-null discipline as
    size/aggregate (and DuckDB len/list_sum), so kernel == expression
    holds on corpora containing nulls too."""
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=[1.0]), Row(vec_id=2, embedding=None),
         Row(vec_id=3, embedding=[0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: (r["dim"], r["sq_norm_micro"])
           for r in sq_norms_arrow(df).collect()}
    want = {r["vec_id"]: (r["dim"], r["sq_norm_micro"])
            for r in sq_norms_expr(df).collect()}
    assert got == want
    assert got[2] == (None, None)
    assert got[1] == (1, 1_000_000 * 1_000_000)


def test_arrow_kernel_inner_null_element_poisons_sum_only(spark):
    """A non-null vector CONTAINING a null element keeps its dim but sums
    to NULL — the JVM fold's acc + NULL semantics; the kernel must never
    cast the inner null (NaN -> int64 is undefined garbage)."""
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=[1.0, None, 2.0]),
         Row(vec_id=2, embedding=[1.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: (r["dim"], r["sq_norm_micro"])
           for r in sq_norms_arrow(df).collect()}
    want = {r["vec_id"]: (r["dim"], r["sq_norm_micro"])
            for r in sq_norms_expr(df).collect()}
    assert got == want
    assert got[1] == (3, None)
    assert got[2] == (2, 5_000_000_000_000)
