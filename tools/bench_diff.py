#!/usr/bin/env python3
"""Per-round bench regression tripwire.

Usage: python3 tools/bench_diff.py <old_bench.json> <new_bench.json> [threshold]

Both inputs are bench JSON lines (the `{"metric":"total",...,"queries":{...}}`
shape graft.Bench prints) or driver BENCH_r{N}.json wrappers (whose useful
per-query data may live in a truncated `tail` string — parsed best-effort).

Flags every entry slower than `threshold`x (default 2.0) its previous-round
time, ignoring sub-0.3s entries on both sides (pure noise at sf0.1). Exits 1
when any regression is flagged so the round workflow can't miss a silent
slide — the r4->r5 tt_* 3x regression shipped because nothing diffed rounds.
"""
import json
import re
import sys

NOISE_FLOOR = 0.3  # seconds; below this on both sides, skip


def load(path):
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        m = re.search(r'\{"metric".*', text)
        if m is None:
            raise SystemExit(f"no bench JSON found in {path}")
        d = json.loads(m.group(0))
    if "queries" in d and isinstance(d["queries"], dict):
        return d["queries"]
    # Driver wrapper: parsed may be null, tail is the truncated line end.
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]["queries"]
    tail = d.get("tail", "")
    pairs = re.findall(r'"([a-z0-9_]+)":([0-9][0-9.eE+-]*)', tail)
    out = {}
    for k, v in pairs:
        try:
            out[k] = float(v)
        except ValueError:
            pass
    if not out:
        raise SystemExit(f"no per-query timings found in {path}")
    return out


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    shared = sorted(set(old) & set(new))
    flagged = []
    for k in shared:
        if old[k] < NOISE_FLOOR and new[k] < NOISE_FLOOR:
            continue
        if old[k] > 0 and new[k] / old[k] > threshold:
            flagged.append((new[k] / old[k], k, old[k], new[k]))
    print(f"compared {len(shared)} shared entries "
          f"({len(old)} old, {len(new)} new), threshold {threshold}x, "
          f"noise floor {NOISE_FLOOR}s")
    # A vanished entry is the WORST regression class (crashed, renamed,
    # silently dropped) — it must fail the diff, not just print.
    missing = sorted(set(old) - set(new))
    if missing:
        print(f"MISSING in new run: {', '.join(missing)}")
    for ratio, k, a, b in sorted(flagged, reverse=True):
        print(f"REGRESSION {k}: {a:.2f}s -> {b:.2f}s ({ratio:.1f}x)")
    if not flagged and not missing:
        print("no regressions flagged")
    sys.exit(1 if (flagged or missing) else 0)


if __name__ == "__main__":
    main()
