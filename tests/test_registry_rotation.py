"""Hard audit for the driver-evidence gap (round-3 ADVICE item 5).

The grading driver samples the FIRST 50 insertion-order entries of
``QUERIES`` each round.  Rounds 1-3 each ended with a backlog of entries
that had never produced a driver row because the registry grew past the
window mid-round.  These tests make the rotation discipline a CI
invariant instead of a manual step:

1. While never-driver-green entries exist, the first ``min(50, n_never)``
   slots must ALL be never-green entries — i.e. the rotation has actually
   been applied, so every driver sample clears maximum debt.
2. The backlog must fit in the remaining driver windows: with R rounds of
   history, a query introduced in round r has had (R - r) sampling
   opportunities; we approximate this by requiring the never-green count
   to be <= 2 windows (one this round + one next), the bound the round-3
   verdict demanded.  Registry additions that would push the backlog past
   that budget fail here, forcing the addition to wait or the rotation to
   be re-applied.
"""

import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")

from fast_carpenter_spark.queries import QUERIES

REPO = "/root/repo"
WINDOW = 50


def _driver_green() -> set:
    green = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            for key, row in json.load(fh).items():
                if (
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match")
                ):
                    green.add(key)
    return green


def test_rotation_applied():
    green = _driver_green()
    keys = list(QUERIES)
    never = [k for k in keys if k not in green]
    head = keys[: min(WINDOW, len(never))]
    stale = [k for k in head if k in green]
    assert not stale, (
        f"rotation not applied: {len(stale)} already-driver-green entries "
        f"occupy first-{WINDOW} slots while {len(never)} entries still lack "
        f"a driver row: {stale[:10]}"
    )


def test_backlog_fits_two_windows():
    green = _driver_green()
    never = [k for k in QUERIES if k not in green]
    assert len(never) <= 2 * WINDOW, (
        f"{len(never)} registry entries have never been driver-checked, "
        f"exceeding the 2-window budget ({2 * WINDOW}); stop adding queries "
        f"until the driver catches up (round-3 VERDICT 'What's wrong' #1)"
    )
