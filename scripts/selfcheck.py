#!/usr/bin/env python3
"""Dev-only self-check: replay the driver's DuckDB-oracle comparison locally.

Usage: python3 scripts/selfcheck.py /root/testdata/sf0.01 /tmp/vout

For each query dumped by `graft.Verify` into OUTDIR/<name>/ (parquet) with its
oracle in OUTDIR/oracle_sql.json, runs the oracle in DuckDB over the same
fixture tables and compares: column names (sorted), row count, and exact cell
values (floats compared bit-for-bit, then with 1e-9 tolerance reported
separately). This mirrors the driver's hash-match gate so mismatches surface
before the round's CORRECTNESS run. Not part of the engine; dev tooling only.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        # Type gate: DuckDB widens sum(BIGINT) to HUGEINT (plain and windowed);
        # pandas silently coerces it back so value-compare can't see it, but the
        # driver's typed hash does (q135, round 8). Flag any widened column so
        # the oracle gets an explicit CAST before the round boundary.
        rel = con.sql(sql)
        wide = [c for c, t in zip(rel.columns, rel.types)
                if "HUGEINT" in str(t).upper()]
        if wide:
            print(f"FAIL {name}: oracle column(s) {wide} typed HUGEINT/UINT — "
                  f"add CAST(... AS BIGINT) in the oracle SQL")
            n_fail += 1
            continue
        ecols, gcols = sorted(exp.columns), sorted(got.columns)
        if ecols != gcols:
            print(f"FAIL {name}: columns {gcols} != oracle {ecols}")
            n_fail += 1
            continue
        exp, got = exp[ecols], got[ecols]
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != oracle {len(exp)}")
            n_fail += 1
            continue
        exact = True
        close = True
        worst = None
        for c in ecols:
            ev, gv = exp[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                a, b = norm(a), norm(b)
                if a == b or (a is None and b is None):
                    continue
                exact = False
                if isinstance(a, float) and isinstance(b, float) and \
                        abs(a - b) <= 1e-9 * max(1.0, abs(a)):
                    continue
                close = False
                if worst is None:
                    worst = (c, i, a, b)
        if exact:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        elif close:
            print(f"WARN {name}: values within 1e-9 but not bit-exact "
                  f"({len(got)} rows) — may still fail a strict hash gate")
            n_fail += 1
        else:
            c, i, a, b = worst
            print(f"FAIL {name}: first diff col={c} row={i}: got {b!r} != oracle {a!r}")
            n_fail += 1
    print(f"\n{n_pass} exact-pass / {n_pass + n_fail} oracled queries")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
