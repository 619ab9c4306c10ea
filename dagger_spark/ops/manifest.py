"""Versioned-manifest pointer protocol shared by the at-rest state stores
(``ops/dedup_state.py`` and, from round 13, ``ops/ivf_index.py``).

A state directory holds immutable data files plus::

    _CURRENT            -> "manifest_vN.json"     (tmp + atomic rename)
    manifest_vN.json    file lists per logical table + named watermarks

Every mutation writes ONLY new files, then publishes a new manifest and
swings the pointer atomically — the single commit point.  A reader
always resolves a complete consistent version; a crash mid-mutation
leaves the previous version live plus unreferenced garbage that the
next compaction garbage-collects.  Because a Structured Streaming
batch id can ride INSIDE the manifest (``watermarks`` dict, one key
per named stream), data files and the stream watermark commit in the
same rename — the property that makes foreachBatch ingest EXACTLY-ONCE
under at-least-once replay, with no window between "data visible" and
"batch recorded".  At 100 TB the same shape is a Delta/Iceberg table
group and its commit log; the protocol (not the JSON) is the design.
"""

from __future__ import annotations

import json
import os
import uuid


def read_manifest(state_dir: str) -> dict:
    """Resolve the live manifest through the ``_CURRENT`` pointer.  The
    returned dict carries its own file name under the private ``__name``
    key (publish strips double-underscore keys)."""
    ptr = os.path.join(state_dir, "_CURRENT")
    with open(ptr) as f:
        name = f.read().strip()
    with open(os.path.join(state_dir, name)) as f:
        m = json.load(f)
    m["__name"] = name
    return m


def publish_manifest(state_dir: str, manifest: dict) -> None:
    """Write manifest_v{N}.json, then swing _CURRENT atomically — the
    commit point of every mutation."""
    manifest = {k: v for k, v in manifest.items() if not k.startswith("__")}
    name = f"manifest_v{manifest['version']}.json"
    with open(os.path.join(state_dir, name), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    tmp = os.path.join(state_dir, f"_CURRENT.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        f.write(name)
    os.rename(tmp, os.path.join(state_dir, "_CURRENT"))


def stream_watermark(m: dict, stream: str):
    """Last applied batch id for a NAMED stream (manifest ``watermarks``
    dict).  Streams are independent: an admission feed ('ingest') and a
    takedown feed ('takedown') each own their key, so their Structured
    Streaming batch-id sequences — both monotone from 0 — never collide."""
    return (m.get("watermarks") or {}).get(stream)


def merged_watermarks(m: dict, stream: str, batch_id) -> dict:
    """The manifest's watermark dict with ``stream`` advanced to
    ``batch_id`` (no-op when batch_id is None).  Every publish must carry
    the WHOLE merged dict — erasing another stream's key would let that
    stream double-apply replayed batches (advice r11, ivm.py lesson)."""
    wms = dict(m.get("watermarks") or {})
    if batch_id is not None:
        wms[stream] = batch_id
    return wms
