#!/usr/bin/env python3
"""COVERAGE.md <-> SparkEntry.queries consistency check (r12 directive 7).

260+ capability rows outgrew manual auditability. This asserts, both ways:
  1. every query key (each `EngineQuery("<name>", ...)` literal in
     src/main/scala/graft/queries/*.scala) is referenced in COVERAGE.md —
     either literally or via a `prefix_*` wildcard;
  2. every backticked token in COVERAGE.md that LOOKS like a query name
     (first `_`-segment matches a real key family) resolves to at least
     one key (literally or as a wildcard).

Run standalone (`python3 tools/coverage_check.py`) or via tools/compare.py
(the local Verify gate runs it after the oracle diff).
"""
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def query_keys():
    keys = set()
    for f in (REPO / "src/main/scala/graft/queries").glob("*.scala"):
        keys |= set(re.findall(r'EngineQuery\(\s*"([a-z0-9_]+)"', f.read_text()))
    return keys


def coverage_tokens(text):
    """Backticked tokens that could name queries: lowercase word chars
    and `*` only (no paths, no dots, no camelCase, no spaces)."""
    return set(t for t in re.findall(r"`([a-z0-9_*]+)`", text) if "_" in t)


def resolves(token, keys):
    if token in keys:
        return True
    if token.endswith("*"):
        prefix = token[:-1]
        return any(k.startswith(prefix) for k in keys)
    return False


def covered(key, tokens):
    if key in tokens:
        return True
    return any(t.endswith("*") and key.startswith(t[:-1]) for t in tokens)


def main():
    keys = query_keys()
    if not keys:
        print("coverage_check: FAIL — no EngineQuery keys found (regex drift?)")
        return 1
    text = (REPO / "COVERAGE.md").read_text()
    tokens = coverage_tokens(text)
    families = {k.split("_", 1)[0] for k in keys}

    missing = sorted(k for k in keys if not covered(k, tokens))
    # Only tokens whose first segment names a real query family can be
    # stale query references; everything else (column names, field
    # names) is prose.
    stale = sorted(
        t for t in tokens
        if t.split("_", 1)[0] in families and not resolves(t, keys))

    ok = True
    if missing:
        ok = False
        print(f"coverage_check: {len(missing)} query key(s) missing from COVERAGE.md:")
        for k in missing:
            print(f"  - {k}")
    if stale:
        ok = False
        print(f"coverage_check: {len(stale)} COVERAGE.md token(s) match no query key:")
        for t in stale:
            print(f"  - {t}")
    if ok:
        print(f"coverage_check: OK — {len(keys)} query keys all mapped in "
              f"COVERAGE.md, no stale references")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
