#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json entry in DuckDB over the parquet tables in sfDir,
loads the engine's parquet dump for the same query, sorts columns by name and
rows by value, and compares cell-by-cell (exact for non-floats, 1e-9 relative
tolerance for floats — strict enough that the driver's hash compare should
also pass if this does).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def rows_key(row):
    return tuple(str(c) for c in row)


def type_mismatch(engine_cols, engine_types, oracle_cols, oracle_types):
    """Column-name → type-string comparison, incl. decimal precision/scale.

    The driver's hash gate is sensitive to the serialized parquet types
    (r10's dq_benford failed on DECIMAL(7,6) vs DECIMAL(18,6) with identical
    values), so the local gate must check types too. Integer-width
    differences (INT vs BIGINT) are tolerated — the driver compares those by
    value — but DECIMAL/DOUBLE/DATE/TIMESTAMP class + decimal precision must
    match exactly.
    """
    int_widths = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
                  "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
    et = {c: str(t) for c, t in zip(engine_cols, engine_types)}
    ot = {c: str(t) for c, t in zip(oracle_cols, oracle_types)}
    for c in sorted(et):
        a, b = et[c], ot.get(c, "?")
        if a == b:
            continue
        if a in int_widths and b in int_widths:
            continue
        # FLOAT vs DOUBLE: both hash as float64 driver-side
        if {a, b} <= {"FLOAT", "DOUBLE"}:
            continue
        return f"TYPE MISMATCH col {c}: engine={a} oracle={b}"
    return None


def compare(name, engine_rows, engine_cols, oracle_rows, oracle_cols):
    if sorted(engine_cols) != sorted(oracle_cols):
        return f"SCHEMA MISMATCH engine={sorted(engine_cols)} oracle={sorted(oracle_cols)}"
    if len(engine_rows) != len(oracle_rows):
        return f"ROWCOUNT MISMATCH engine={len(engine_rows)} oracle={len(oracle_rows)}"
    # reorder columns by sorted name
    e_idx = [engine_cols.index(c) for c in sorted(engine_cols)]
    o_idx = [oracle_cols.index(c) for c in sorted(oracle_cols)]
    e = sorted([tuple(norm(r[i]) for i in e_idx) for r in engine_rows], key=rows_key)
    o = sorted([tuple(norm(r[i]) for i in o_idx) for r in oracle_rows], key=rows_key)
    for i, (er, orow) in enumerate(zip(e, o)):
        for ec, oc in zip(er, orow):
            if isinstance(ec, float) and isinstance(oc, float):
                if not math.isclose(ec, oc, rel_tol=1e-9, abs_tol=1e-9):
                    return f"VALUE MISMATCH row {i}: {er} vs {orow}"
            elif str(ec) != str(oc):
                return f"VALUE MISMATCH row {i}: {er} vs {orow}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        eng_path = Path(out_dir) / name
        if not eng_path.exists():
            print(f"FAIL {name}: engine parquet missing")
            n_fail += 1
            continue
        try:
            erel = con.sql(f"SELECT * FROM read_parquet('{eng_path}/*.parquet')")
            engine_cols, engine_types = erel.columns, erel.types
            engine_rows = erel.fetchall()
            orel = con.sql(sql)
            oracle_cols, oracle_types = orel.columns, orel.types
            oracle_rows = orel.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: {ex}")
            n_fail += 1
            continue
        err = (type_mismatch(engine_cols, engine_types, oracle_cols, oracle_types)
               or compare(name, engine_rows, engine_cols, oracle_rows, oracle_cols))
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(engine_rows)} rows)")
            n_pass += 1
    # COVERAGE.md <-> query-key consistency rides the same gate (r12
    # directive 7): a query without a coverage row, or a stale coverage
    # reference, fails the run even when every oracle row is green. It
    # folds into n_fail BEFORE the summary line prints, so the human-read
    # line and the exit code can never disagree.
    import coverage_check
    n_fail += 1 if coverage_check.main() else 0
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
