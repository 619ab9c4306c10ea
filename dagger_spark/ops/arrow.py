"""Arrow-native vectorized operators via ``DataFrame.mapInArrow`` — the one
Python-UDF flavor where batches stay in Arrow end-to-end (no pandas
conversion on either edge).

When to reach for it: numeric kernels over ARRAY columns.  A pandas round
trip materializes each list cell as a Python object (or a nested Series),
which dominates the kernel cost; ``mapInArrow`` hands the raw Arrow
buffers over, so a flattened ``numpy`` view of every vector in the batch
is a zero-copy slice and the kernel is one vectorized pass.  The JVM-side
``F.transform``/``F.aggregate`` expression form is still preferred where
the math is expressible (ops/similarity keeps cosine/dot in codegen); this
module exists for kernels that want numpy semantics, and to pin the
mapInArrow plumbing (schema contract, batch shape, offsets handling) with
an exact-integer differential.

Exactness discipline: elements are micro-quantized with the engine-shared
``floor(x*1e6 + 0.5)`` double expression (bit-identical in numpy, JVM and
DuckDB) and all sums run in int64 — order-free, so the DuckDB oracle
hash-matches and the Spark-expression twin must agree EXACTLY, not
approximately (pinned in tests/test_arrow_ops.py).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SQ_NORMS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("dim", T.IntegerType(), True),
        T.StructField("sq_norm_micro", T.LongType(), True),
    ]
)


def sq_norms_arrow(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, dim, Σ floor(x·1e6+0.5)²) per vector — one flattened numpy pass
    per Arrow batch.  SQL-null discipline, matched to the expression twin
    exactly: a NULL vector gives NULL dim and NULL sum (``size``/
    ``aggregate`` on NULL); a non-null vector CONTAINING a null element
    keeps its dim but sums to NULL (``acc + NULL`` poisons the JVM fold);
    zero-length vectors sum to 0 via the cumsum-window form (``reduceat``
    would mis-handle them, and naive NaN-casting of inner nulls would
    produce int64 garbage)."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            emb = b.column(b.schema.get_field_index(vec_col))
            ids = b.column(b.schema.get_field_index(id_col))
            null_mask = emb.is_null().to_numpy(zero_copy_only=False)
            # list_flatten skips null TOP-LEVEL entries (so fill_null(0)
            # on the lengths keeps the per-row windows aligned) but
            # keeps null ELEMENTS, which must poison their row's sum —
            # never be cast (NaN -> int64 is undefined)
            lens = pc.fill_null(
                pc.list_value_length(emb), 0
            ).to_numpy().astype(np.int64)
            flat = pc.list_flatten(emb)
            inner_null = flat.is_null().to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            vals = pc.fill_null(flat, 0.0).to_numpy(
                zero_copy_only=False
            ).astype(np.float64)
            q = np.floor(vals * 1e6 + 0.5).astype(np.int64)
            csum = np.concatenate([[0], np.cumsum(q * q)])
            ncsum = np.concatenate([[0], np.cumsum(inner_null)])
            ends = np.cumsum(lens)
            starts = ends - lens
            sums = csum[ends] - csum[starts]
            sum_mask = null_mask | ((ncsum[ends] - ncsum[starts]) > 0)
            yield pa.RecordBatch.from_arrays(
                [
                    ids.cast(pa.int64()),
                    pa.array(lens.astype(np.int32), pa.int32(),
                             mask=null_mask),
                    pa.array(sums, pa.int64(), mask=sum_mask),
                ],
                names=["vec_id", "dim", "sq_norm_micro"],
            )

    return df.select(F.col(id_col), F.col(vec_col)).mapInArrow(
        kernel, SQ_NORMS_SCHEMA
    )


def sq_norms_expr(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """The JVM-expression twin of :func:`sq_norms_arrow`: identical output
    from ``transform`` + ``aggregate`` in whole-stage codegen.  This is
    the form a plan should prefer when no numpy kernel is needed; the
    exact-integer equality of the two (tests/test_arrow_ops.py) is the
    differential that licenses swapping one for the other."""
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * 1e6 + 0.5).cast("long"),
    )
    return df.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.size(F.col(vec_col)).alias("dim"),
        F.aggregate(
            q,
            F.lit(0).cast("long"),
            lambda acc, v: acc + v * v,
        ).alias("sq_norm_micro"),
    )
