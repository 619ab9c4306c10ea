"""Fuzzed-corpus differential testing for the similarity-search operators.

Randomized 64-dim embedding corpora salted with the vectors that stress
cosine edge handling: the all-zero vector (norm-0 guard), exact duplicates
(score 1.0 ties broken by neighbor id), negated and scaled copies, and
near-misses a few ulps apart.  Every query/oracle pair must agree
bit-for-bit after the 6-decimal round.
"""

from __future__ import annotations

import os
import random

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.check_catalog import normalize  # noqa: E402

from dagger_spark.catalog import QUERIES  # noqa: E402

EMB_QUERIES = [
    "ann_brute_force",
    "ann_lsh",
    "ann_ivf",
    "embedding_neardup",
    "kmeans_step_embeddings",
    "semdedup_embeddings",
    "ann_pq_adc",
    "ann_recall",
    "ann_rp",
    "contrastive_triplets",
    "embedding_norms_arrow",
]

DIM = 64


def _random_embeddings(seed: int, n: int = 80) -> pd.DataFrame:
    rng = random.Random(seed)
    vecs = []
    for i in range(n - 8):
        vecs.append([round(rng.uniform(-0.2, 0.2), 6) for _ in range(DIM)])
    # edge vectors
    vecs.append([0.0] * DIM)                       # zero vector (norm 0)
    vecs.append([0.0] * DIM)                       # second zero vector
    base = vecs[0]
    vecs.append(list(base))                        # exact duplicate of vec 0
    vecs.append([-x for x in base])                # negation (score -1)
    vecs.append([x * 3.0 for x in base])           # scaled copy (score 1)
    tweak = list(base)
    tweak[0] += 1e-6                               # near-miss a hair apart
    vecs.append(tweak)
    vecs.append([1.0] + [0.0] * (DIM - 1))         # axis vector
    vecs.append([0.0, 1.0] + [0.0] * (DIM - 2))    # orthogonal axis vector
    rng.shuffle(vecs)
    vecs.append(None)                              # NULL vector row
    return pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": vecs,
            "label": [rng.randint(0, 4) for _ in vecs],
        }
    )


@pytest.fixture(scope="module", params=[3, 999])
def fuzz_emb_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"fuzzemb{request.param}")
    pdf = _random_embeddings(request.param)
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
        os.path.join(str(d), "embeddings.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_embedding_query_matches_oracle_on_fuzzed_corpus(spark, fuzz_emb_dir, name):
    q = QUERIES[name]
    sdf = q.fn(spark, fuzz_emb_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{fuzz_emb_dir}/embeddings.parquet')"
    )
    ddf = con.execute(q.oracle).fetchdf()
    a, b = normalize(sdf), normalize(ddf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{name}: {len(a)} spark vs {len(b)} duckdb rows"
    if not a.equals(b):
        neq = (a != b).any(axis=1)
        raise AssertionError(
            f"{name}: {int(neq.sum())}/{len(a)} rows differ\n"
            + str(pd.concat([a[neq].head(3), b[neq].head(3)], keys=["spark", "duck"]))
        )
