#!/usr/bin/env python3
"""Dev-only pre-flight for the driver's correctness gate (NOT part of the
engine; the Scala library never depends on this). Runs graft.Verify's
output directory against the DuckDB oracle SQL, mirroring the driver's
compare: sort columns by name, compare row-by-row values exactly.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import struct
import sys

import duckdb

def canon(v):
    # Floats compare by BIT PATTERN (catches -0.0 vs +0.0, which Python's
    # == treats as equal but the driver's value hash does not); NaN stays
    # a canonical token so all NaN payloads compare equal.
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return ("f64", struct.pack("<d", v))
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    npass = nfail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            mine_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            mcols = mine_rel.columns
            morder = sorted(range(len(mcols)), key=lambda i: mcols[i])
            mine = [[canon(r[i]) for i in morder] for r in mine_rel.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            nfail += 1
            continue
        try:
            orel = con.sql(sql)
            ocols = orel.columns
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            ora = [[canon(r[i]) for i in oorder] for r in orel.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e).splitlines()[0][:160]}")
            nfail += 1
            continue
        if sorted(c.lower() for c in mcols) != sorted(c.lower() for c in ocols):
            print(f"FAIL {name}: columns {sorted(mcols)} vs {sorted(ocols)}")
            nfail += 1
            continue
        # Compare column TYPES too (name-aligned): Python's int is
        # arbitrary-precision, so a DuckDB HUGEINT oracle column fetches
        # equal to Spark's BIGINT row-by-row while the driver's hash (typed)
        # diverges. This is exactly the class that shipped 5 red rows in r8.
        # Driver-faithful canonicalization (verified against the r8 gate):
        # int widths up to 64-bit hash the same (INTEGER vs BIGINT rows
        # were green), but HUGEINT (int128) does NOT fold into them.
        def canon_type(t):
            return {"TINYINT": "i64", "SMALLINT": "i64",
                    "INTEGER": "i64", "BIGINT": "i64"}.get(t, t)
        mtypes = {mcols[i].lower(): canon_type(str(mine_rel.types[i]))
                  for i in morder}
        otypes = {ocols[i].lower(): canon_type(str(orel.types[i]))
                  for i in oorder}
        tdiff = [(c, mtypes[c], otypes[c]) for c in sorted(mtypes)
                 if mtypes[c] != otypes[c]]
        if tdiff:
            print(f"FAIL {name}: column type mismatch "
                  + "; ".join(f"{c}: spark={a} oracle={b}"
                              for c, a, b in tdiff))
            nfail += 1
            continue
        if len(mine) != len(ora):
            print(f"FAIL {name}: rowcount {len(mine)} vs {len(ora)}")
            nfail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(mine, ora)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: row {i} differs\n  spark : {a}\n  oracle: {b}")
            nfail += 1
        else:
            print(f"PASS {name} ({len(mine)} rows)")
            npass += 1
    print(f"== {npass} pass, {nfail} fail")
    sys.exit(1 if nfail else 0)

if __name__ == "__main__":
    main()
