"""Refresh the rotation-freshness ledger (tests/registry_fingerprints.json).

Convention: run with entry names (or nothing, meaning "every drifted
entry that is currently staged") when turning the rotation — the
ledger records each entry's fingerprint as of its last staging, so a
refresh outside a staging would blind the guard. ``--force`` allows
exactly that, for ledger bootstraps and structural refactors where
the staging capacity cannot hold the blast radius; say why in the
commit message.

Usage:
    python tools/update_fingerprints.py            # staged drifted entries
    python tools/update_fingerprints.py dd05 dd20  # specific entries
    python tools/update_fingerprints.py --force    # ALL drifted entries
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEDGER = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "registry_fingerprints.json",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    from cdc_spark.queries import REGISTRY
    from cdc_spark.queries.fingerprint import all_fingerprints

    import __spark_entry__ as entry

    staged = set(entry.GATE_PREFIX) | set(entry.NEXT_TIER)
    current = all_fingerprints()
    ledger: dict[str, str] = {}
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            ledger = json.load(f)

    drifted = {n for n in current if ledger.get(n) != current[n]}
    gone = [n for n in ledger if n not in REGISTRY]
    if args.names:
        targets = set(args.names)
        unknown = targets - set(current)
        if unknown:
            print(f"unknown entries: {sorted(unknown)}")
            return 1
    elif args.force:
        targets = drifted
    else:
        new = {n for n in drifted if n not in ledger}
        targets = (drifted & staged) | new
        blocked = drifted - staged - new
        if blocked:
            print(
                "refusing to refresh UNSTAGED drifted entries (stage "
                f"them or --force): {sorted(blocked)}"
            )
            return 1

    for n in sorted(targets):
        tag = "new" if n not in ledger else "refresh"
        print(f"{tag}: {n} -> {current[n]}")
        ledger[n] = current[n]
    for n in gone:
        print(f"drop (unregistered): {n}")
        del ledger[n]

    with open(LEDGER, "w") as f:
        json.dump(dict(sorted(ledger.items())), f, indent=1)
        f.write("\n")
    print(f"{len(targets)} updated, {len(gone)} dropped -> {LEDGER}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
