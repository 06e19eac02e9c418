"""Disk-cached prebuilt artifacts for the SERVING-shaped queries.

The equivalence-proof queries (doc_neardup_incremental,
orders_merge_view, orders_join_view, …) pay index/table/view
CONSTRUCTION inside the query by design — that is what makes them
proofs. Their serving twins measure what a production loop actually
runs: a read of a prebuilt artifact. This helper builds the artifact
once per (fixture identity, params) under a temp path and reuses it
across invocations and processes — the offline-build / online-serve
split.

RACE-SAFE publish: the build lands in a unique staging dir and is
published with one atomic ``os.rename``; a concurrent builder that
loses the race discards its copy and uses the winner's (builds are
deterministic, so the copies are interchangeable). ``marker`` is the
file whose presence at the top level proves a COMPLETE artifact (an
index's ``meta.json``; multi-store artifacts write an explicit
completion marker as their last build step).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid
from collections.abc import Callable


def cached_artifact(
    sf_dir: str,
    params: str,
    build: Callable[[str], None],
    fixture: str | list[str] = "documents.parquet",
    marker: str = "meta.json",
) -> str:
    # ``fixture`` may list EVERY table the artifact embeds (round-8
    # advice: the join-view artifact bakes in customer.parquet too, so a
    # regenerated customer fixture must miss the cache, not serve stale
    # results); the key folds each one's (mtime_ns, size)
    fixtures = [fixture] if isinstance(fixture, str) else list(fixture)
    stats = "|".join(
        f"{(st := os.stat(os.path.join(sf_dir, f))).st_mtime_ns}:"
        f"{st.st_size}"
        for f in fixtures
    )
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{params}|{stats}|v2".encode()
    ).hexdigest()[:12]
    out_dir = os.path.join(tempfile.gettempdir(), f"mdp_serveidx_{key}")
    if os.path.exists(os.path.join(out_dir, marker)):
        return out_dir
    staging = f"{out_dir}.build-{uuid.uuid4().hex[:8]}"
    build(staging)
    try:
        os.rename(staging, out_dir)
    except OSError:
        # lost the publish race (or a half-built dir squats the target
        # path from a crashed run): keep the existing winner if it is
        # complete, else replace it
        if not os.path.exists(os.path.join(out_dir, marker)):
            shutil.rmtree(out_dir, ignore_errors=True)
            os.rename(staging, out_dir)
        else:
            shutil.rmtree(staging, ignore_errors=True)
    return out_dir
