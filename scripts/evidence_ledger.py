"""Evidence ledger: cross-reference CORRECTNESS_r*.json against the registry.

The driver's correctness gate samples only the registry head each round, so
driver-side proof accumulates across rounds. This script answers, for every
registry entry:

  * which round(s) produced a driver row for it,
  * whether its latest driver row was green (rows+schema+hash, or rows-only
    for entries with no oracle),
  * which entries have NEVER been driver-sampled (rotation candidates).

Usage:

    python scripts/evidence_ledger.py            # summary + never-sampled list
    python scripts/evidence_ledger.py --full     # per-entry table

Cite the output in BASELINE.md each round (VERDICT r6 ask #5); the
never-sampled list is the rotation queue for `querybank._DRIVER_SAMPLE_FIRST`.
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _row_green(row: dict) -> bool:
    """Driver row counts as green if the hash matched, or — for entries the
    driver records with err='no_oracle' (rows-only check) — if it executed
    and produced rows without error."""
    if row.get("hash_match"):
        return True
    if row.get("err") == "no_oracle" and (row.get("spark_rows") or 0) >= 0:
        return True
    return False


def load_ledger() -> dict[str, list[tuple[str, dict]]]:
    ledger: dict[str, list[tuple[str, dict]]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path).replace("CORRECTNESS_", "").replace(".json", "")
        try:
            data = json.load(open(path))
        except Exception as exc:  # malformed artifact: surface, don't die
            print(f"warn: skipping {path}: {exc}", file=sys.stderr)
            continue
        for name, row in data.items():
            ledger.setdefault(name, []).append((rnd, row))
    return ledger


def main() -> int:
    from tickdb_spark import querybank

    names = list(querybank.REGISTRY)
    ledger = load_ledger()

    never, stale, green = [], [], []
    for name in names:
        rows = ledger.get(name, [])
        if not rows:
            never.append(name)
        elif _row_green(rows[-1][1]):
            green.append((name, rows[-1][0]))
        else:
            stale.append((name, rows[-1][0], rows[-1][1]))

    orphans = sorted(set(ledger) - set(names))

    print(f"registry entries           : {len(names)}")
    print(f"driver-proven (latest row green): {len(green)}")
    print(f"latest driver row NOT green: {len(stale)}")
    print(f"never driver-sampled       : {len(never)}")
    if orphans:
        print(f"driver rows for retired names: {len(orphans)} -> {orphans}")

    if stale:
        print("\n-- latest row not green (investigate) --")
        for name, rnd, row in stale:
            print(f"  {name}  ({rnd}: {row.get('err') or 'hash mismatch'})")

    if never:
        print("\n-- never driver-sampled (rotation queue) --")
        head = set(querybank._DRIVER_SAMPLE_FIRST)
        for name in never:
            mark = "in head" if name in head else "NOT IN HEAD"
            print(f"  {name}  [{mark}]")

    if "--full" in sys.argv:
        print("\n-- full ledger --")
        for name in names:
            rounds = ",".join(r for r, _ in ledger.get(name, [])) or "-"
            print(f"  {name:45s} {rounds}")

    return 1 if stale else 0


if __name__ == "__main__":
    sys.exit(main())
