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

When BOTH artifacts carry a `calib_ratio` stamp (r16: Bench's fixed-work
throttle probes against the BASELINE.md reference), new-run times are
DEFLATED by the ratio of the two calibrations before comparison, so a
host-throttle episode (the r13-r15 judge-adjudication class) stops reading
as a code regression. The applied normalization is printed; raw times are
still shown in the flags.
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
    calib = None
    if isinstance(d, dict):
        calib = d.get("calib_ratio")
        if calib is None and isinstance(d.get("parsed"), dict):
            calib = d["parsed"].get("calib_ratio")
        if calib is None and "tail" in d:
            m = re.search(r'"calib_ratio":([0-9][0-9.eE+-]*)', d.get("tail", ""))
            if m:
                calib = float(m.group(1))
    if "queries" in d and isinstance(d["queries"], dict):
        return d["queries"], calib
    # Driver wrapper: parsed may be null, tail is the truncated line end.
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]["queries"], calib
    tail = d.get("tail", "")
    pairs = re.findall(r'"([a-z0-9_]+)":([0-9][0-9.eE+-]*)', tail)
    # The provenance/calibration stamp sits at the END of the line, so a
    # truncated tail always contains these numeric keys — they are run
    # metadata, not query timings, and scraping them as entries produced
    # spurious MISSING/REGRESSION flags (r16 review).
    stamp_keys = {
        "value", "omitted", "n", "rc", "cpus", "sf", "loadavg_peak1",
        "external_cpu_peak_cores", "steal_peak_cores", "calib_ratio",
        "spin_first", "spin_last", "spark_first", "spark_last",
        "io_first", "io_last", "calib_io_ratio",
        "sampler_errors", "n_errors",
    }
    out = {}
    for k, v in pairs:
        if k in stamp_keys:
            continue
        try:
            out[k] = float(v)
        except ValueError:
            pass
    if not out:
        raise SystemExit(f"no per-query timings found in {path}")
    return out, calib


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    (old, cal_old), (new, cal_new) = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    # Mechanical throttle normalization: deflate the NEW run by the two
    # runs' relative calibration. Only when both stamps exist — a
    # one-sided stamp normalizes nothing.
    norm = 1.0
    if cal_old and cal_new and cal_old > 0:
        norm = cal_new / cal_old
        print(f"calib_ratio old={cal_old:.2f} new={cal_new:.2f} -> "
              f"deflating new-run times by {norm:.2f}x before comparison")
    shared = sorted(set(old) & set(new))
    flagged = []
    for k in shared:
        adj = new[k] / norm
        if old[k] < NOISE_FLOOR and adj < NOISE_FLOOR:
            continue
        if old[k] > 0 and adj / old[k] > threshold:
            flagged.append((adj / old[k], k, old[k], new[k], adj))
    print(f"compared {len(shared)} shared entries "
          f"({len(old)} old, {len(new)} new), threshold {threshold}x, "
          f"noise floor {NOISE_FLOOR}s")
    # A vanished entry is the WORST regression class (crashed, renamed,
    # silently dropped) — it must fail the diff, not just print.
    missing = sorted(set(old) - set(new))
    if missing:
        print(f"MISSING in new run: {', '.join(missing)}")
    for ratio, k, a, b, adj in sorted(flagged, reverse=True):
        extra = f" [raw {b:.2f}s]" if norm != 1.0 else ""
        print(f"REGRESSION {k}: {a:.2f}s -> {adj:.2f}s ({ratio:.1f}x){extra}")
    if not flagged and not missing:
        print("no regressions flagged")
    sys.exit(1 if (flagged or missing) else 0)


if __name__ == "__main__":
    main()
