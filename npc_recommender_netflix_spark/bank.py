"""Shared scan of the committed driver-correctness bank.

Both the driver-queue ordering (``__spark_entry__._never_banked_first``)
and the SURVEY §8 count gate (``tools/inventory.py --check``) need the
same two facts from the committed ``CORRECTNESS_r*.json`` artifacts:

* which record counts as a PASS (hash_match true, a rows-only record
  ``err == 'no_oracle'`` with a non-null spark row count, or a legacy
  bare-list entry), and
* per key, the LATEST round's record and whether it passed.

Round-12 advice: these two call sites had drifted into duplicate
implementations of the same rule; if the bank format or pass rule evolves
in one place the SURVEY §8 gate silently diverges from the driver's
re-banking order. This module is now the single owner of both.
"""

from __future__ import annotations

import glob
import json
import os
import re

_ARTIFACT_RE = re.compile(r"CORRECTNESS_r(\d+)\.json$")


def record_passed(rec) -> bool:
    """Pass rule for one driver record (latest-record semantics apply
    at the caller via :func:`latest_records`)."""
    if not isinstance(rec, dict):
        # Legacy artifacts may store bare key lists; treat presence as a
        # pass so they don't re-front the whole early bank.
        return True
    if rec.get("hash_match") is True:
        return True
    # rows-only keys: the driver records err='no_oracle' and only a
    # spark-side row count; a non-null count is the pass signal.
    return rec.get("err") == "no_oracle" and rec.get("spark_rows") is not None


def latest_records(
    artifacts_dir: str, max_round: int | None = None
) -> dict[str, tuple[int, bool]]:
    """Per key, ``(round, passed)`` of the LATEST committed driver record.

    ``max_round`` (inclusive) lets callers derive the bank as of an
    earlier round — e.g. excluding a driver artifact written after the
    final commit of a round.
    """
    latest: dict[str, tuple[int, bool]] = {}
    # sorted() so glob order can't matter; ties on round number resolve
    # by >= below (later-sorted file wins deterministically).
    for path in sorted(glob.glob(os.path.join(artifacts_dir, "CORRECTNESS_r*.json"))):
        m = _ARTIFACT_RE.search(path)
        if not m:
            # Unconventionally-named artifacts are not driver rounds;
            # skip rather than silently treating them as round 0.
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
        try:
            with open(path) as fh:
                data = json.load(fh)
        except Exception:
            continue
        items = data.items() if isinstance(data, dict) else ((k, None) for k in data)
        for key, rec in items:
            if key not in latest or rnd >= latest[key][0]:
                latest[key] = (rnd, record_passed(rec))
    return latest


def banked_keys(artifacts_dir: str, max_round: int | None = None) -> set[str]:
    """Keys whose latest committed driver record passed."""
    return {
        k for k, (_, ok) in latest_records(artifacts_dir, max_round).items() if ok
    }


def bank_rounds(artifacts_dir: str) -> list[int]:
    """Sorted round numbers with a committed artifact."""
    rounds = set()
    for path in glob.glob(os.path.join(artifacts_dir, "CORRECTNESS_r*.json")):
        m = _ARTIFACT_RE.search(path)
        if m:
            rounds.add(int(m.group(1)))
    return sorted(rounds)
