"""Property tests for the round-3 continuation wave's two strongest
algorithmic claims, pinned against pure-Python reference implementations:

1. bpe_encode_docs claims chained string replace() IS the BPE apply
   algorithm (merge-priority order globally, left-to-right non-overlapping
   within a merge).  The reference here is the classic symbol-list merge
   loop from the BPE literature; hypothesis feeds random words and random
   (but well-formed) merge tables.

2. cdc_chunk_docs claims content-defined boundaries RESYNCHRONIZE: after
   inserting a token, every chunk strictly after the insertion point's
   enclosing chunk(s) keeps its identity (hash), unlike fixed-size
   chunking where one insertion shifts every later chunk.
"""

from __future__ import annotations

import hashlib
import zlib

from hypothesis import given, settings, strategies as st


# --- 1. chained replace() == classic BPE merge loop -----------------------

def _bpe_classic(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Textbook BPE apply: symbols start as characters; each merge (a, b)
    is applied in table order, scanning left-to-right non-overlapping."""
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _bpe_replace(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """The engine's formulation: space-join chars, then chained replace
    of 'a b' -> 'ab' (Python str.replace has the same left-to-right
    non-overlapping semantics as Spark's replace() and DuckDB's)."""
    s = " ".join(word)
    for a, b in merges:
        s = s.replace(f"{a} {b}", a + b)
    return s.split(" ") if s else []


def _boundary_safe(merges: list[tuple[str, str]], alphabet: str) -> bool:
    """The exact condition under which chained replace('a b','ab') equals
    the symbol-list scan: at each merge (a, b), no symbol producible so
    far other than a itself ENDS with a, and none other than b itself
    STARTS with b — otherwise the string match 'a b' can span a token
    boundary inside a longer symbol (e.g. merge (j,o) with symbol 'ow'
    present: 'j ow' contains 'j o').  Discovered by this very property
    test; the shipped merge table is verified corpus-safe separately."""
    symbols = set(alphabet)
    for a, b in merges:
        for s in symbols:
            if s != a and s.endswith(a):
                return False
            if s != b and s.startswith(b):
                return False
        symbols.add(a + b)
    return True


def _random_merges(alphabet: str, n: int, rng) -> list[tuple[str, str]]:
    """Merge tables the way BPE training builds them: each operand is a
    char or an earlier merge's result."""
    symbols = list(alphabet)
    merges = []
    for _ in range(n):
        a = rng.choice(symbols)
        b = rng.choice(symbols)
        merges.append((a, b))
        symbols.append(a + b)
    return merges


@settings(max_examples=300, deadline=None)
@given(st.data())
def test_chained_replace_is_bpe_apply_when_boundary_safe(data):
    import random

    rng = random.Random(data.draw(st.integers(0, 2**32 - 1)))
    alphabet = "abcde"
    merges = _random_merges(alphabet, rng.randint(0, 8), rng)
    if not _boundary_safe(merges, alphabet):
        return  # covered by the divergence test below
    word = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 20)))
    assert _bpe_replace(word, merges) == _bpe_classic(word, merges), (
        word, merges,
    )


def test_boundary_unsafe_table_diverges_as_predicted():
    """The counterexample class that motivates the invariant: after (o,w),
    the merge (j,o) string-matches across the 'j|ow' token boundary and
    glues j to HALF of 'ow' — replace() says ['jow'], BPE says
    ['j','ow'].  Keeping this pinned documents why _boundary_safe is the
    real precondition, not 'operands are producible symbols'."""
    merges = [("o", "w"), ("j", "o")]
    assert not _boundary_safe(merges, "jow")
    assert _bpe_classic("jow", merges) == ["j", "ow"]
    assert _bpe_replace("jow", merges) == ["jow"]  # the wrong-but-consistent
    # cross-engine parity is unaffected: Spark and DuckDB both run
    # replace(), so both produce the same (documented) discretization.


def test_engine_merge_table_exact_on_corpus_vocabulary():
    """The shipped _BPE_MERGES is NOT globally boundary-safe ((j,o) after
    (o,w)/(o,r)) — but no corpus word reaches the unsafe adjacency.  Prove
    it the strong way: encode EVERY distinct corpus word (sf0.01, the
    driver-gate SF) with both algorithms and assert identical pieces."""
    import duckdb

    from dagger_spark.catalog import _BPE_MERGES

    merges = [tuple(p.split(" ")) for p, _ in _BPE_MERGES]
    words = [w for (w,) in duckdb.connect().execute(
        "SELECT DISTINCT unnest(string_split(trim(coalesce(text,'')), ' ')) "
        "FROM read_parquet('/root/testdata/sf0.01/documents.parquet')"
    ).fetchall() if w]
    assert len(words) > 20
    for w in words:
        assert _bpe_replace(w, merges) == _bpe_classic(w, merges), w


# --- 2. CDC boundaries resynchronize after an insertion -------------------

_CDC_MOD = 8  # must match catalog.cdc_chunk_docs


def _md5_int(w: str) -> int:
    return int(hashlib.md5(w.encode()).hexdigest()[:8], 16)


def _cdc_chunks(toks: list[str]) -> list[str]:
    """Pure-Python twin of cdc_chunk_docs: a token whose hash = 0 mod 8
    CLOSES its chunk; chunk identity = crc of the joined chunk text."""
    chunks, cur = [], []
    for w in toks:
        cur.append(w)
        if _md5_int(w) % _CDC_MOD == 0:
            chunks.append(" ".join(cur))
            cur = []
    if cur:
        chunks.append(" ".join(cur))
    return chunks


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_cdc_chunks_resync_after_insertion(data):
    import random

    rng = random.Random(data.draw(st.integers(0, 2**32 - 1)))
    vocab = [f"w{i}" for i in range(40)]
    toks = [rng.choice(vocab) for _ in range(rng.randint(2, 120))]
    pos = rng.randint(0, len(toks))
    mutated = toks[:pos] + [rng.choice(vocab)] + toks[pos:]

    orig, mut = _cdc_chunks(toks), _cdc_chunks(mutated)
    # identity from the END: all chunks after the insertion's enclosing
    # chunk are byte-identical — the CDC property fixed-size chunking lacks
    tail = 0
    while (tail < min(len(orig), len(mut))
           and orig[-1 - tail] == mut[-1 - tail]):
        tail += 1
    # tokens strictly after the next boundary past `pos` are untouched:
    # count boundaries after the insertion point in the ORIGINAL stream
    n_chunks_after = sum(
        1 for i in range(pos, len(toks)) if _md5_int(toks[i]) % _CDC_MOD == 0
    )
    # every fully-post-insertion chunk must have survived (>= because the
    # mutated prefix can coincidentally re-align earlier)
    assert tail >= max(0, n_chunks_after - 1), (toks, pos)


def test_fixed_chunking_lacks_resync_for_contrast():
    """The motivating contrast: fixed 5-token chunking shifts EVERY chunk
    after an insertion at position 0, while CDC preserves all complete
    post-insertion chunks."""
    toks = [f"w{i}" for i in range(30)]
    shifted = ["new"] + toks
    fixed = lambda ts: [" ".join(ts[i:i + 5]) for i in range(0, len(ts), 5)]
    f_orig, f_mut = fixed(toks), fixed(shifted)
    assert all(a != b for a, b in zip(f_orig, f_mut))  # nothing survives
    c_orig, c_mut = _cdc_chunks(toks), _cdc_chunks(shifted)
    shared = set(c_orig) & set(c_mut)
    n_boundaries = sum(1 for w in toks if _md5_int(w) % _CDC_MOD == 0)
    if n_boundaries >= 1:
        assert shared, "CDC must preserve at least the resynced tail"
