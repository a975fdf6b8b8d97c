"""Print the recommended next driver window under the standing
rotation policy (queries/__init__.py docstring): smoke first, then
names passed as --changed / --new, then everything else
OLDEST-GREEN-FIRST by latest green round in the committed
CORRECTNESS_r0*.json artifacts (never-attested registry names sort
oldest of all). Output is one name per line, truncated to the window
size — paste into ``_PRIORITY`` and keep the comments.

    python tools/rotate_window.py [--changed a,b] [--new c,d] [--k 50]
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dnsflow_clickhouse_spark.queries import QUERY_REGISTRY

SMOKE = "q1_pricing_summary"


def latest_green() -> dict[str, int]:
    out: dict[str, int] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int("".join(ch for ch in Path(f).stem if ch.isdigit()))
        rows = json.loads(Path(f).read_text())
        for q, v in rows.items():
            green = (
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match") in (True, None)
                and not v.get("err")
            )
            if green:
                out[q] = max(out.get(q, 0), rnd)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--changed", default="", help="comma-separated names")
    ap.add_argument("--new", default="", help="comma-separated names")
    ap.add_argument("--k", type=int, default=50)
    a = ap.parse_args()
    changed = [q for q in a.changed.split(",") if q]
    new = [q for q in a.new.split(",") if q]
    green = latest_green()
    head = [SMOKE] + [q for q in changed + new if q != SMOKE]
    rest = sorted(
        (q for q in QUERY_REGISTRY if q not in head),
        key=lambda q: (green.get(q, 0), q),
    )
    window = (head + rest)[: a.k]
    for q in window:
        print(q)
    dropped = len(head) + len(rest) - a.k
    if dropped > 0:
        print(
            f"# ({dropped} names beyond the window — changed ones need a "
            "SWEEP_VERIFY artifact)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
