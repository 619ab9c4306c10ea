"""Single-writer lease discipline (round-11 verdict ask #3): the index/
state lifecycles must serialize or refuse concurrent writers — never
interleave.  Drives the lease primitive directly and through the IVF
lifecycle entry points (an append racing an in-flight compaction swap)."""

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from dagger_spark.ops.ivf_index import (
    append_to_sq8_ivf_index,
    build_sq8_ivf_index,
    compact_sq8_ivf_index,
    delete_from_sq8_ivf_index,
)
from dagger_spark.ops.lease import ConcurrentWriterError, writer_lease

SF = "/root/testdata/sf0.01"


def test_acquire_release_cycle(tmp_path):
    d = str(tmp_path / "s")
    with writer_lease(d):
        assert os.path.exists(os.path.join(d, "_LOCK"))
    assert not os.path.exists(os.path.join(d, "_LOCK"))
    # immediately re-acquirable
    with writer_lease(d):
        pass


def test_second_writer_refused_while_held(tmp_path):
    d = str(tmp_path / "s")
    with writer_lease(d):
        with pytest.raises(ConcurrentWriterError, match="lease held"):
            with writer_lease(d):
                pass
    # ...and the refusal did not damage the holder's lock: it was still
    # released cleanly above
    assert not os.path.exists(os.path.join(d, "_LOCK"))


def test_stale_lease_taken_over(tmp_path):
    d = str(tmp_path / "s")
    os.makedirs(d)
    lock = os.path.join(d, "_LOCK")
    with open(lock, "w") as f:
        f.write("dead-holder pid=0 t=0")
    old = time.time() - 3600
    os.utime(lock, (old, old))
    with writer_lease(d, ttl=60):
        with open(lock) as f:
            assert "dead-holder" not in f.read()  # our token won
    assert not os.path.exists(lock)


def test_release_on_exception(tmp_path):
    d = str(tmp_path / "s")
    with pytest.raises(RuntimeError, match="boom"):
        with writer_lease(d):
            raise RuntimeError("boom")
    assert not os.path.exists(os.path.join(d, "_LOCK"))


def test_release_ignores_foreign_lock(tmp_path):
    """A takeover that replaced our lock must not be deleted by our
    release — the token check scopes release to our own lease."""
    d = str(tmp_path / "s")
    lease = writer_lease(d)
    lease.__enter__()
    lock = os.path.join(d, "_LOCK")
    os.unlink(lock)
    with open(lock, "w") as f:
        f.write("someone-else")
    lease.__exit__(None, None, None)
    with open(lock) as f:
        assert f.read() == "someone-else"


@pytest.fixture(scope="module")
def scratch_index(spark):
    base = build_sq8_ivf_index(spark, SF, n_centroids=16)
    d = "/tmp/dagger_test_lease_idx"
    shutil.rmtree(d, ignore_errors=True)
    shutil.copytree(base, d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_lifecycle_refuses_second_writer(spark, scratch_index):
    """An append arriving while another writer (e.g. an in-flight
    compaction swap) holds the lease is REFUSED, not interleaved — and
    the same gate guards delete and compact."""
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).filter(
        F.col("embedding").isNotNull()
    )
    delta = emb.filter(
        (F.col("vec_id") >= 20) & (F.col("vec_id") < 24)
    ).select((F.col("vec_id") + 5_000_000).alias("vec_id"), "embedding")
    with writer_lease(scratch_index):  # the in-flight writer
        with pytest.raises(ConcurrentWriterError):
            append_to_sq8_ivf_index(spark, scratch_index, delta)
        with pytest.raises(ConcurrentWriterError):
            delete_from_sq8_ivf_index(
                spark, scratch_index,
                ids=spark.createDataFrame([(20,)], "vec_id long"),
            )
        with pytest.raises(ConcurrentWriterError):
            compact_sq8_ivf_index(spark, scratch_index)
    # serialization: once the holder releases, the same calls succeed
    n = append_to_sq8_ivf_index(spark, scratch_index, delta)
    assert n == 4
    stats = compact_sq8_ivf_index(spark, scratch_index, max_files_per_cell=1)
    assert stats["files_after"] <= stats["files_before"]


def test_append_with_auto_compact_holds_one_lease(spark, scratch_index):
    """Auto-compaction runs inside the append's own lease (re-entrancy by
    composition, not by a re-entrant lock) — and releases it at the end."""
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).filter(
        F.col("embedding").isNotNull()
    )
    for i in range(3):
        delta = emb.filter(
            (F.col("vec_id") >= 20) & (F.col("vec_id") < 24)
        ).select(
            (F.col("vec_id") + 6_000_000 + 100 * i).alias("vec_id"),
            "embedding",
        )
        append_to_sq8_ivf_index(
            spark, scratch_index, delta, auto_compact_max_files=1
        )
    assert not os.path.exists(os.path.join(scratch_index, "_LOCK"))


def test_heartbeat_keeps_long_mutation_alive(tmp_path):
    """Advice r12: a LIVE writer whose mutation outruns ttl must not look
    stale — the heartbeat refreshes the lock's mtime every ttl/3, so a
    second acquirer keeps being refused for the whole (long) hold."""
    d = str(tmp_path / "s")
    with writer_lease(d, ttl=0.3):
        time.sleep(1.0)  # > 3x ttl: without the heartbeat this is stale
        with pytest.raises(ConcurrentWriterError, match="lease held"):
            with writer_lease(d, ttl=0.3):
                pass
    assert not os.path.exists(os.path.join(d, "_LOCK"))


def test_heartbeat_stops_touching_foreign_lock(tmp_path):
    """If the lease is broken and re-acquired behind the holder's back,
    the old holder's heartbeat must NOT freshen the new owner's file."""
    d = str(tmp_path / "s")
    lease = writer_lease(d, ttl=0.3)
    lease.__enter__()
    lock = os.path.join(d, "_LOCK")
    os.unlink(lock)
    with open(lock, "w") as f:
        f.write("new-owner")
    old = time.time() - 3600
    os.utime(lock, (old, old))
    time.sleep(0.5)  # several heartbeat intervals
    assert os.stat(lock).st_mtime == old  # never freshened by us
    lease.__exit__(None, None, None)
    with open(lock) as f:
        assert f.read() == "new-owner"
    os.unlink(lock)


def test_retry_concurrent_waits_out_holder(tmp_path):
    """retry_concurrent (advice r12): a streaming caller's mutation racing
    another feed's lease retries with backoff and succeeds once the
    holder releases, instead of killing the streaming query."""
    from dagger_spark.ops.lease import retry_concurrent

    d = str(tmp_path / "s")
    holder = writer_lease(d)
    holder.__enter__()
    calls = {"n": 0}

    def mutate():
        calls["n"] += 1
        if calls["n"] == 2:
            holder.__exit__(None, None, None)  # holder finishes mid-retries
        with writer_lease(d):
            return "done"

    assert retry_concurrent(mutate, attempts=5, base=0.01) == "done"
    assert calls["n"] >= 2
    # exhausted attempts re-raise
    blocker = writer_lease(d)
    blocker.__enter__()
    try:
        with pytest.raises(ConcurrentWriterError):
            retry_concurrent(
                lambda: writer_lease(d).__enter__(), attempts=2, base=0.01
            )
    finally:
        blocker.__exit__(None, None, None)


def test_breaker_arbitration(tmp_path):
    """Review r12: stale-lock removal runs under a breaker lock — a
    second breaker is refused while one is inside the section, and a
    stale breaker lock (its holder died mid-break) is itself removable."""
    d = str(tmp_path / "s")
    os.makedirs(d)
    lock = os.path.join(d, "_LOCK")
    with open(lock, "w") as f:
        f.write("dead-holder")
    old = time.time() - 3600
    os.utime(lock, (old, old))
    # a FRESH breaker lock blocks the takeover path
    with open(lock + ".breaker", "w") as f:
        f.write("other-breaker")
    with pytest.raises(ConcurrentWriterError, match="breaking"):
        with writer_lease(d, ttl=60):
            pass
    # a STALE breaker lock is swept and the takeover proceeds
    os.utime(lock + ".breaker", (old, old))
    with pytest.raises(ConcurrentWriterError, match="breaking"):
        with writer_lease(d, ttl=60):
            pass  # first attempt only sweeps the stale breaker
    with writer_lease(d, ttl=60):
        assert os.path.exists(lock)
    assert not os.path.exists(lock)
