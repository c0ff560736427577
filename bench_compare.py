"""Per-query bench regression gate.

Compares a current bench run (bench.py JSON line, or a driver
BENCH_r{N}.json artifact) against a baseline artifact and flags
regressions above a threshold (default 1.5x).

The driver's BENCH_r{N}.json keeps only the *tail* of the bench stdout
when the line is long, so per-query baselines are recovered with a
tolerant regex scan over whatever text is available ("parsed" is used
when present).

Usage:
    python bench_compare.py BASELINE.json CURRENT.json [threshold]
    python bench.py | python bench_compare.py BENCH_r01.json -
Exit code 1 when any query regresses past the threshold (new queries and
queries absent from the baseline are reported informationally only).
"""

from __future__ import annotations

import json
import math
import re
import sys


def load_timings(source: str) -> dict[str, float]:
    text = sys.stdin.read() if source == "-" else open(source).read()
    # Try full-JSON forms first: bench.py line or driver artifact.
    try:
        d = json.loads(text)
        if isinstance(d, dict):
            if isinstance(d.get("queries"), dict):
                return {k: float(v) for k, v in d["queries"].items()}
            parsed = d.get("parsed")
            if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
                return {k: float(v) for k, v in parsed["queries"].items()}
            text = d.get("tail", text)  # fall through to the regex scan
    except (json.JSONDecodeError, TypeError, ValueError):
        pass
    pairs = re.findall(r'"(q\d+[a-z0-9_]*)":\s*(-?\d+(?:\.\d+)?)', text)
    return {k: float(v) for k, v in pairs}


def compare(
    baseline: dict[str, float],
    current: dict[str, float],
    threshold: float = 1.5,
    min_abs_sec: float = 1.0,
) -> dict:
    """Regression = current > threshold * baseline AND the delta is at
    least ``min_abs_sec`` (sub-second queries jitter well past 1.5x on a
    shared box; a 0.3s -> 0.5s swing is noise, not a plan change)."""
    regressions, improvements, errors = {}, {}, []
    for name, cur in sorted(current.items()):
        base = baseline.get(name)
        if cur < 0:
            errors.append(name)
            continue
        if base is None or base <= 0:
            continue
        ratio = cur / base
        if ratio > threshold and cur - base >= min_abs_sec:
            regressions[name] = {"base": base, "cur": cur, "ratio": round(ratio, 2)}
        elif ratio < 1 / threshold and base - cur >= min_abs_sec:
            improvements[name] = {"base": base, "cur": cur, "ratio": round(ratio, 2)}
    shared = [
        n
        for n, cur in current.items()
        if cur > 0 and baseline.get(n, 0) > 0
    ]
    geomean = (
        round(
            math.exp(
                sum(math.log(current[n] / baseline[n]) for n in shared)
                / len(shared)
            ),
            4,
        )
        if shared
        else None
    )
    tail = sorted(
        ((v, n) for n, v in current.items() if v > 5.0), reverse=True
    )
    return {
        "regressions": regressions,
        "improvements": improvements,
        "errors": errors,
        "n_compared": sum(1 for n in current if baseline.get(n, 0) > 0),
        # round-over-round headline: geometric-mean ratio over shared
        # queries (the number every VERDICT quotes), and the >5s tail
        # (the floor-watch list) — both previously recomputed ad hoc
        "geomean": geomean,
        "tail_over_5s": [
            {"query": n, "sec": round(v, 2)} for v, n in tail
        ],
    }


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    baseline = load_timings(sys.argv[1])
    current = load_timings(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    report = compare(baseline, current, threshold)
    print(json.dumps(report, indent=2))
    return 1 if report["regressions"] or report["errors"] else 0


if __name__ == "__main__":
    sys.exit(main())
