"""LLM-data-pipeline operators beyond the reference surface (BASELINE.json
north star): dedup, similarity search, text analysis, multimodal columns.

Every operator here is pure ``pyspark.sql.functions`` (JVM-side, codegen)
except the multimodal decode stubs, which are Arrow-batched ``mapInPandas``
by necessity.  Each operator has a DuckDB-expressible formulation used by the
driver's differential oracle (__spark_entry__.py) and by tests.
"""

from .text import (
    doc_fingerprint, language_id, quality_score, text_stats, token_count, tokens,
)
from .dedup import (
    exact_dedup, hashed_docs, minhash_signature, minhash_bands,
    minhash_candidate_pairs, ngram_jaccard_pairs, simhash, word_shingles,
)
from .similarity import (
    brute_force_topk, cosine_sim, lsh_bucket, lsh_topk, rp_topk,
)
from .audio import decode_wav, encode_wav, extract_audio_features
from .graph import pagerank_int
from .quality import profile_table
from .video import decode_avi, encode_avi, sample_video_frames

__all__ = [
    "doc_fingerprint", "language_id", "quality_score", "text_stats",
    "token_count", "tokens",
    "exact_dedup", "hashed_docs", "minhash_signature", "minhash_bands",
    "minhash_candidate_pairs", "ngram_jaccard_pairs", "simhash", "word_shingles",
    "brute_force_topk", "cosine_sim", "lsh_bucket", "lsh_topk", "rp_topk",
    "decode_wav", "encode_wav", "extract_audio_features",
    "decode_avi", "encode_avi", "sample_video_frames",
    "pagerank_int", "profile_table",
]
