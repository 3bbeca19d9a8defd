#!/usr/bin/env bash
# sf1 scale smoke — the check that has caught a real scale bug every time
# it ran (r6: recursion DISTINCT + ppjoin length filter, r9: simhash pair
# shuffle blow-up). One command:
#
#   tools/sf1_smoke.sh [baseline_bench_full.json]
#
# 1. Builds /tmp/sf1 (10x key-shifted replica of sf0.1 via graft.ScaleGen,
#    join-consistent keys, word-shuffled docs) unless it already exists.
# 2. Runs graft.Bench over it (full run by default; export
#    SPARK_GRAFT_BENCH_ONLY=prefix1,prefix2 to smoke one family).
# 3. Prints the BASELINE.md-style table, slowest entries first, with the
#    sf0.1-vs-sf1 ratio when a baseline bench_full JSON is given —
#    anything super-linear (>10x for 10x data) is a scale suspect.
#
# Results land in bench/bench_full_<tag>.json (run provenance: tag + loadavg).
set -euo pipefail
cd "$(dirname "$0")/.."

SF1_DIR=${SF1_DIR:-/tmp/sf1}
BASELINE_JSON=${1:-}

# Heap tier is PINNED (r14 ops rule, r15 directive 8 — ends the
# sf1@48g/8g double bookkeeping): sf1 and below run the 8 g default;
# only sf10 needs 48 g (8 g OOMs in the stateful CDC build). Measured
# cause-shape (r14_sf1_full vs r14_sf1_full8g, identical code+data):
# at 48 g only the STREAMING-REPLAY builds slowed 4-10x — the replay
# path churns per-batch state/shuffle objects whose native and disk
# resources are reclaimed via GC-driven ContextCleaner weak refs, and
# a 6x larger heap GCs ~6x less often, so dead state piles up exactly
# there (the same mechanism SPARK_GRAFT_GC_EACH exists for); everything
# non-replay was within noise (median ratio 1.04). Cross-SF comparisons
# of CDC/SCD build entries must be same-heap.
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-8g}
if [ "$SPARK_DRIVER_MEM" != "8g" ]; then
  echo "WARNING: sf1 smoke with SPARK_DRIVER_MEM=$SPARK_DRIVER_MEM — replay-build" >&2
  echo "  numbers will not be comparable to the 8g baselines (see header note)." >&2
fi

if [ ! -d "$SF1_DIR/orders.parquet" ]; then
  echo "== building $SF1_DIR (ScaleGen 10x of sf0.1)..." >&2
  sbt -batch "runMain graft.ScaleGen /root/testdata/sf0.1 $SF1_DIR 10" >/dev/null
fi

TAG=${SPARK_GRAFT_RUN_TAG:-sf1smoke_$(date -u +%Y%m%dT%H%M%S)}
echo "== bench over $SF1_DIR (tag $TAG)..." >&2
SPARK_GRAFT_SF_DIR="$SF1_DIR" SPARK_GRAFT_RUN_TAG="$TAG" \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' >/dev/null

python3 - "bench/bench_full_$TAG.json" "$BASELINE_JSON" <<'EOF'
import json, sys
cur = json.load(open(sys.argv[1]))
base = json.load(open(sys.argv[2]))["queries"] if len(sys.argv) > 2 and sys.argv[2] else {}
qs = cur["queries"]
print(f"run_tag: {cur['run_tag']}  loadavg start/end: "
      f"{cur.get('loadavg_start','?')} / {cur.get('loadavg_end','?')}")
print(f"total: {cur['value']:.1f}s over {len(qs)} entries; "
      f"errors: {len(cur.get('errors', {}))}")
for k, e in cur.get("errors", {}).items():
    print(f"ERROR {k}: {e}")
hdr = "| entry | sf1 (s) |" + (" sf0.1 (s) | ratio |" if base else "")
print(hdr)
print("|---|---|" + ("---|---|" if base else ""))
for k, v in sorted(qs.items(), key=lambda kv: -kv[1])[:25]:
    if base and k in base and base[k] > 0:
        r = v / base[k]
        flag = " **scale suspect**" if r > 10 else ""
        print(f"| {k} | {v:.1f} | {base[k]:.1f} | {r:.1f}x{flag} |")
    else:
        print(f"| {k} | {v:.1f} |")
EOF
