"""Round dashboard: the numbers every round's first half-hour recomputes.

Prints one JSON object:
  - registry size and the driver-check prefix (what the next
    CORRECTNESS round will stamp)
  - the never-stamped backlog (entries with no green driver row in any
    committed CORRECTNESS_r*.json) and how many rounds the rotation
    needs to drain it at 50/round
  - per-round stamp history (distinct ever-green counts)
  - latest bench_local record: total, query count, >5s tail

Usage: python tools/round_status.py [--prefix N]   (default prefix 50)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tytodb_spark import queries as Q

PREFIX = 50


def main() -> int:
    prefix = PREFIX
    args = sys.argv[1:]
    if args and args[0] == "--prefix" and len(args) > 1:
        prefix = int(args[1])
    elif args and args[0].startswith("--prefix="):
        prefix = int(args[0].split("=", 1)[1])
    elif args:
        print(f"unrecognized argument: {args[0]}", file=sys.stderr)
        return 2

    names = list(Q.REGISTRY)  # already in driver-check order
    green = Q._driver_green_rounds()
    never = [n for n in names if n not in green]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    per_round: dict[int, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if m:
            per_round[int(m.group(1))] = None  # filled below
    for rnd in per_round:
        per_round[rnd] = sum(1 for v in green.values() if v >= 0 and v == rnd)

    # canonical records only (bench_local_rNN.json) — annotated
    # siblings like bench_local_r19_churned.json are evidence exhibits,
    # not round records
    bench_files = sorted(
        f
        for f in glob.glob(os.path.join(repo, "bench_local_r*.json"))
        if re.fullmatch(r"bench_local_r\d+\.json", os.path.basename(f))
    )
    bench = None
    if bench_files:
        try:
            d = json.load(open(bench_files[-1]))
            qs = d.get("queries", {})
            bench = {
                "file": os.path.basename(bench_files[-1]),
                "total_sec": d.get("value"),
                "n_queries": len(qs),
                "tail_over_5s": sorted(
                    (
                        {"query": k, "sec": round(v, 2)}
                        for k, v in qs.items()
                        if isinstance(v, (int, float)) and v > 5
                    ),
                    key=lambda t: -t["sec"],
                ),
            }
        except (OSError, ValueError):
            pass

    out = {
        "registry": len(names),
        "next_driver_prefix": names[:prefix][:5] + ["..."] + names[:prefix][-2:],
        "ever_stamped_green": len(green),
        "never_stamped": len(never),
        "never_stamped_names": never,
        "rounds_to_drain_at_50": -(-len(never) // prefix) if never else 0,
        "latest_stamp_round_counts": {
            str(r): c for r, c in sorted(per_round.items())
        },
        "latest_bench": bench,
    }
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
