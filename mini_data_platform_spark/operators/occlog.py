"""Shared optimistic-concurrency commit log — put-if-absent tickets.

The merge table (operators/mergetable.py:100-147) introduced the
protocol; round 9 lifts the mechanism here so the OTHER commit-log
stores (the incremental dedup indexes, the maintained views) can drop
their single-writer caveat: two pipelines appending to one dedup index
is a realistic deployment (round-8 verdict item 5).

Protocol (same words as mergetable's header):

- The COMMIT LOG is the sequence of records ``_commits/<version>.json``.
  A writer commits version v by atomically creating that file
  (``os.link`` of a fully-written temp file — creation is put-if-absent
  AND the content is complete when it appears; on object storage
  substitute the store's conditional put). First writer wins; the loser
  re-reads the recovered state and retries with the next version.
- The store's ``meta.json`` demotes to a CHECKPOINT: ``roll_forward``
  replays any tickets the checkpoint hasn't absorbed (idempotently — a
  record replays to the same meta), so a winner crashing between its
  ticket and the checkpoint write loses nothing.
- Data files carry WRITER-UNIQUE names written BEFORE the ticket: two
  racing writers never collide on a path, the loser's files are
  invisible orphans (vacuumed later), and a committed record always
  points at fully-written data.

What stays store-specific: the record vocabulary and its replay
semantics (``apply_record``) — each store passes its own.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Callable

_COMMITS = "_commits"


def ticket_path(store_dir: str, version: int) -> str:
    return os.path.join(store_dir, _COMMITS, f"{version:012d}.json")


def try_ticket(store_dir: str, version: int, record: dict) -> bool:
    """Atomically publish ``record`` as commit ``version``. True iff
    this writer won (the ticket file did not exist)."""
    cdir = os.path.join(store_dir, _COMMITS)
    os.makedirs(cdir, exist_ok=True)
    tmp = os.path.join(cdir, f".tmp-{os.getpid()}-{uuid.uuid4().hex}")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(record, f)
    try:
        os.link(tmp, ticket_path(store_dir, version))
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


def roll_forward(
    store_dir: str,
    meta: dict,
    apply_record: Callable[[dict, dict], dict],
    checkpoint: Callable[[dict], None],
) -> dict:
    """Replay every ticket past ``meta['version']`` onto ``meta`` and
    (only if anything rolled) write the advanced checkpoint. The caller
    seeds ``meta['version']`` (legacy stores default it from their
    batch count) and supplies the store's record semantics."""
    v = meta["version"]
    rolled = False
    while os.path.exists(ticket_path(store_dir, v)):
        with open(ticket_path(store_dir, v), encoding="utf-8") as f:
            rec = json.load(f)
        meta = apply_record(meta, rec)
        v = meta["version"]
        rolled = True
    if rolled:
        checkpoint(meta)
    return meta
