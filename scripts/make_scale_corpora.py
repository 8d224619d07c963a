#!/usr/bin/env python3
"""Dev-only: generate the perturbed-replica corpora ScaleCheck consumes.

Each output dir gets a documents.parquet that is the sf0.1 table replicated
Nx: copies receive offset doc_ids and a per-copy token appended to the text,
so every cross-copy pair is a genuine near-duplicate (Jaccard just under 1)
and the near-dup graph densifies super-linearly while doc count grows
linearly — the adversarial shape for dedup/graph scaling checks.

Usage: python3 scripts/make_scale_corpora.py [/tmp/scale_x2 /tmp/scale_x4]
Then:  sbt "runMain graft.ScaleCheck /root/testdata/sf0.1 /tmp/scale_x2 /tmp/scale_x4"
"""
import os, sys
import duckdb

BASE = "/root/testdata/sf0.1/documents.parquet"
BASE_N = 5000

def main(outs):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW base AS SELECT * FROM '{BASE}'")
    for mult, out in outs:
        os.makedirs(out, exist_ok=True)
        parts = ["SELECT doc_id, text, lang, source, n_chars FROM base"]
        for c in range(1, mult):
            parts.append(
                f"SELECT doc_id + {c * BASE_N} AS doc_id, "
                f"text || ' xcopy{c}' AS text, lang, source, "
                f"n_chars + length(' xcopy{c}') AS n_chars FROM base")
        con.execute(f"COPY ({' UNION ALL '.join(parts)} ORDER BY doc_id) "
                    f"TO '{out}/documents.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
        print(f"{out}: {n} docs ({mult}x)")

if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/tmp/scale_x2", "/tmp/scale_x4"]
    main(list(zip([2, 4], dirs)))
