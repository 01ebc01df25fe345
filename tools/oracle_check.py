#!/usr/bin/env python3
"""Driver-equivalent correctness check: for each query output written by
graft.Verify, run the matching oracle SQL in DuckDB over the same testdata
parquet tables and compare (row count, column names, value hash).

Compare semantics mirror the driver: columns sorted by name, rows sorted,
values stringified then hashed. Floats are rounded to 6 significant decimals
before hashing to absorb representation noise (the driver hashes exact values,
so queries should still be written to be exactly deterministic — this script
flags near-misses separately).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import hashlib
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 6))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def canon_table(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = sorted(",".join(canon_value(r[i]) for i in order) for r in rows)
    h = hashlib.md5("\n".join(out).encode()).hexdigest()
    return [names[i] for i in order], len(rows), h, out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    results = {}
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            results[name] = {"status": "MISSING_OUTPUT"}
            continue
        try:
            got = pq.read_table(str(qdir))
            got_names = got.column_names
            cols = got.to_pydict()
            got_rows = [tuple(r) for r in zip(*[cols[c] for c in got_names])] \
                if got.num_rows else []
            rel = con.sql(oracle[name])
            # r16 lesson (t69/t71): this script fetches tuples (exact Python
            # ints), but the DRIVER materializes through pandas, which renders
            # DuckDB HUGEINT as float64 ("701.0" vs "701") and the hash
            # diverges while values are integer-equal. Surface the hazard
            # here so a local OK can't hide a driver red.
            hazard_types = [(n, str(t)) for n, t in zip(rel.columns, rel.types)
                            if str(t) in ("HUGEINT", "UHUGEINT")]
            exp = rel.fetchall()
            exp_names = list(rel.columns)
            gn, gc, gh, gout = canon_table(got_names, got_rows)
            en, ec, eh, eout = canon_table(exp_names, exp)
            status = "OK" if (gn == en and gc == ec and gh == eh) else "MISMATCH"
            detail = {}
            if status == "MISMATCH":
                if gn != en:
                    detail["cols"] = {"got": gn, "exp": en}
                if gc != ec:
                    detail["rows"] = {"got": gc, "exp": ec}
                if gh != eh and gn == en and gc == ec:
                    diffs = [(a, b) for a, b in zip(gout, eout) if a != b][:3]
                    detail["first_diffs"] = diffs
            if hazard_types and status == "OK":
                status = "OK_TYPE_HAZARD"
                detail["hugeint_cols"] = hazard_types
            results[name] = {"status": status, "rows": gc, **detail}
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "ERROR", "error": str(e)[:500]}
    ok = sum(1 for r in results.values() if r["status"] == "OK")
    hazards = [n for n, r in results.items() if r["status"] == "OK_TYPE_HAZARD"]
    print(json.dumps(results, indent=2, default=str))
    print(f"\n{ok}/{len(results)} OK")
    if hazards:
        print(f"TYPE HAZARDS (values match here but the driver's pandas "
              f"hash will diverge — cast the oracle column): {hazards}")
    return 0 if ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
