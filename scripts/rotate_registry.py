"""Print the driver-sample rotation the registry will use this round.

The rotation itself is applied live by ``__spark_entry__.queries()``
(via ``ocrd_calamari_spark.rotation.rotated_order``) — this script is
the inspection surface: run it after each round's CORRECTNESS_r*.json
lands to see which keys will occupy the driver's ~50-entry sample
window next round, and to confirm that never-checked / changed / failed
keys rotated to the front.

Usage: python scripts/rotate_registry.py [window_size]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ocrd_calamari_spark.entry_queries import ORACLES, QUERIES  # noqa: E402
from ocrd_calamari_spark.rotation import (  # noqa: E402
    CHANGED_SINCE_GREEN,
    load_evidence,
    rotated_order,
)


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    last = load_evidence(REPO)
    order = rotated_order(list(QUERIES), set(ORACLES), REPO)
    print(f"registry: {len(order)} keys; sample window: first {window}")
    print(f"forced-front (changed since green): {list(CHANGED_SINCE_GREEN)}")
    never = [k for k in order if k not in last and k not in CHANGED_SINCE_GREEN]
    print(f"never driver-checked: {len(never)}")
    for i, k in enumerate(order):
        marker = "  <-- window cut" if i == window else ""
        seen = f"r{last[k]:02d}" if k in last else "---"
        oracle = "hash" if k in ORACLES else "rows"
        print(f"{i + 1:4d}  {seen}  {oracle}  {k}{marker}")


if __name__ == "__main__":
    main()
