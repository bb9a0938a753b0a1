"""Refresh VERIFIED_HASHES.json — run FIRST THING each round, before any
code edit (SURVEY.md round checklist).

VERIFIED_HASHES.json records, per oracle-backed query id, the
(operator source + oracle SQL) content hash the code had when the driver
last verified the id green. The registry ordering
(breweries_case_spark/operators/__init__.py::_registry_rank) compares the
current hash against this record: a mismatch demotes the id from the
stably-proven tier to the proven-but-modified tier, which ranks INSIDE
the driver's 50-slot scored window — so any semantic change gets driver
re-verification the following round instead of keeping a stale green.

Update rule: an entry is (re)written with the CURRENT hash only when the
driver has greened the id in a round strictly newer than the entry's
recorded round — i.e. the id was just re-verified under the code now in
the tree (the driver runs on the committed end-of-round state, which is
exactly the round-start state this script sees). Entries without a newer
green are left untouched, so a hash recorded before a later code change
keeps flagging the id as modified until the driver re-greens it.

--stale QID...  force the named ids to the sentinel hash "STALE" at
                their latest green round. Used when code changed AFTER
                the last green (so the verified-time hash is unknown and
                the plain rule would wrongly bless the new code).

Known limitation: the hash covers the operator FUNCTION source + its
oracle SQL, not helpers it calls — a change inside a shared helper
(e.g. a signature kernel) does not flag its callers. Use --stale for
callers of a changed helper when the change is not proven
output-identical; the stably-proven rotation still re-covers every id
within ~5 rounds regardless.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def latest_green_rounds() -> dict[str, int]:
    out: dict[str, int] = {}
    for f in ROOT.glob("CORRECTNESS_r*.json"):
        m = re.match(r"CORRECTNESS_r(\d+)\.json", f.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            results = json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        for qid, r in results.items():
            if (
                isinstance(r, dict)
                and r.get("rows_match")
                and r.get("schema_match")
                and r.get("hash_match")
            ):
                out[qid] = max(out.get(qid, 0), rnd)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stale", nargs="*", default=[])
    args = ap.parse_args()

    from breweries_case_spark.operators import (
        collect_registry,
        current_round,
        query_content_hash,
    )

    queries, oracles = collect_registry()
    greens = latest_green_rounds()

    path = ROOT / "VERIFIED_HASHES.json"
    try:
        entries = json.loads(path.read_text()).get("entries", {})
    except (OSError, ValueError):
        entries = {}

    updated, forced = [], []
    for qid, last_green in sorted(greens.items()):
        if qid not in queries or qid not in oracles:
            continue
        prev = entries.get(qid)
        if prev is None or last_green > prev.get("round", 0):
            entries[qid] = {
                "hash": query_content_hash(queries[qid], oracles[qid]),
                "round": last_green,
            }
            updated.append(qid)
    for qid in args.stale:
        if qid not in greens:
            raise SystemExit(f"--stale {qid}: id was never driver-green")
        entries[qid] = {"hash": "STALE", "round": greens[qid]}
        forced.append(qid)

    path.write_text(
        json.dumps(
            {"refreshed_for_round": current_round(), "entries": entries},
            indent=1,
            sort_keys=True,
        )
        + "\n"
    )
    print(
        f"round {current_round()}: {len(updated)} refreshed, "
        f"{len(forced)} forced stale, {len(entries)} total entries"
    )


if __name__ == "__main__":
    main()
