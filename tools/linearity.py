#!/usr/bin/env python3
"""Per-family linearity table from two bench_full JSONs (r12 directive 3).

Usage: python3 tools/linearity.py bench/bench_full_A.json bench/bench_full_B.json [data_ratio]

A = smaller SF run, B = larger SF run, data_ratio = B/A data scale
(default 10). Prints a markdown table: per FAMILY (prefix before the
first '_'), the summed seconds at each SF, the time ratio, and the
implied exponent log(time_ratio)/log(data_ratio) — <= 1.0 is linear or
better. Entries missing from either run (errors, skips) are listed so a
partial run can't read as full coverage.
"""
import json
import math
import sys


def family(name):
    return name.split("_", 1)[0]


def main():
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))

    fams = {}
    for k in common:
        f = fams.setdefault(family(k), [0.0, 0.0, 0])
        f[0] += qa[k]
        f[1] += qb[k]
        f[2] += 1

    print(f"| Family | n | {sys.argv[1].split('/')[-1]} (s) | "
          f"{sys.argv[2].split('/')[-1]} (s) | ratio | implied exponent "
          f"(vs {ratio:g}x data) |")
    print("|---|---|---|---|---|---|")
    for fam in sorted(fams, key=lambda f: -fams[f][1]):
        ta, tb, n = fams[fam]
        r = tb / ta if ta > 0 else float("inf")
        exp = math.log(r) / math.log(ratio) if ta > 0 and r > 0 else float("nan")
        print(f"| {fam} | {n} | {ta:.1f} | {tb:.1f} | {r:.2f}x | {exp:.2f} |")
    ta, tb = sum(qa[k] for k in common), sum(qb[k] for k in common)
    r = tb / ta if ta else float("inf")
    print(f"| **all common** | {len(common)} | {ta:.1f} | {tb:.1f} | {r:.2f}x "
          f"| {math.log(r)/math.log(ratio):.2f} |")

    # Worst per-entry ratios — the scale suspects, named.
    worst = sorted(common, key=lambda k: -(qb[k] / max(qa[k], 1e-9)))[:12]
    print("\nWorst per-entry ratios (scale suspects):")
    for k in worst:
        print(f"  {k}: {qa[k]:.2f}s -> {qb[k]:.2f}s ({qb[k]/max(qa[k],1e-9):.1f}x)")
    if only_a:
        print(f"\nIn {sys.argv[1]} only ({len(only_a)}): {', '.join(only_a)}")
    if only_b:
        print(f"\nIn {sys.argv[2]} only ({len(only_b)}): {', '.join(only_b)}")
    for tag, d in (("A", a), ("B", b)):
        if d.get("errors"):
            print(f"\n{tag} errors: {d['errors']}")
        if d.get("skipped"):
            print(f"{tag} skipped: {d['skipped']}")


if __name__ == "__main__":
    main()
