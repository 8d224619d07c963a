#!/usr/bin/env python3
"""Dev-only: generate the perturbed-replica corpora ScaleCheck consumes.

Each output dir gets a documents.parquet that is the sf0.1 table replicated
Nx: copies receive offset doc_ids and a per-copy token appended to the text,
so every cross-copy pair is a genuine near-duplicate (Jaccard just under 1)
and the near-dup graph densifies super-linearly while doc count grows
linearly — the adversarial shape for dedup/graph scaling checks.

Usage: python3 scripts/make_scale_corpora.py [/tmp/scale_x2 /tmp/scale_x4 /tmp/scale_x8]
(the replication factor parses from each dir's trailing _xN)
Then:  sbt "runMain graft.ScaleCheck /root/testdata/sf0.1 /tmp/scale_x2 /tmp/scale_x4 /tmp/scale_x8"
"""
import os, re, sys
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

        # Star tables for the ranking/skew tier (q112/q143/q158/q162):
        # copies get offset keys and a per-copy price nudge so the global
        # value order interleaves copies instead of concatenating them —
        # the adversarial shape for a range-partitioned ranking.
        star = {
            "orders": ("o_orderkey", "o_custkey",
                       "SELECT o_orderkey + {ko} AS o_orderkey, o_custkey + {kc} AS o_custkey, "
                       "o_orderstatus, o_totalprice + {c} * 0.01 AS o_totalprice, "
                       "o_orderdate, o_orderpriority FROM sbase_orders"),
            "lineitem": ("l_orderkey", None,
                         "SELECT l_orderkey + {ko} AS l_orderkey, l_partkey, l_suppkey, "
                         "l_linenumber, l_quantity, l_extendedprice + {c} * 0.01 AS l_extendedprice, "
                         "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM sbase_lineitem"),
            "customer": ("c_custkey", None,
                         "SELECT c_custkey + {kc} AS c_custkey, c_name, c_nationkey, "
                         "c_acctbal + {c} * 0.01 AS c_acctbal, c_mktsegment FROM sbase_customer"),
        }
        base_dir = os.path.dirname(BASE)
        ko = con.sql(f"SELECT max(o_orderkey) + 1 FROM '{base_dir}/orders.parquet'").fetchone()[0]
        kc = con.sql(f"SELECT max(c_custkey) + 1 FROM '{base_dir}/customer.parquet'").fetchone()[0]

        # Events for the event-analytics tier (q160/q165/q166/q170/q176/
        # q178): copies get offset event_ids and NEW user ids but keep the
        # time axis, so per-user partitions multiply while the calendar
        # stays fixed — the growth shape of an audience doubling.
        ke = con.sql(f"SELECT max(event_id) + 1 FROM '{base_dir}/events.parquet'").fetchone()[0]
        ku = con.sql(f"SELECT max(user_id) + 1 FROM '{base_dir}/events.parquet'").fetchone()[0]
        # ts is emitted as raw epoch-ns BIGINT: DuckDB would otherwise write
        # timestamp[us], which Tables.read's ns-as-long contract misreads by
        # 1000x (a collapsed time axis — q170/q176 went empty on it).
        con.execute(f"CREATE OR REPLACE VIEW sbase_events AS SELECT * FROM '{base_dir}/events.parquet'")
        eparts = [
            "SELECT event_id, CAST(epoch_ns(ts) AS BIGINT) AS ts, user_id, "
            "event_type, value, props FROM sbase_events"]
        for c in range(1, mult):
            eparts.append(
                f"SELECT event_id + {c * ke} AS event_id, "
                f"CAST(epoch_ns(ts) AS BIGINT) AS ts, user_id + {c * ku} AS user_id, "
                f"event_type, value, props FROM sbase_events")
        con.execute(f"COPY ({' UNION ALL '.join(eparts)} ORDER BY event_id) "
                    f"TO '{out}/events.parquet' (FORMAT PARQUET)")
        en = con.sql(f"SELECT count(*) FROM '{out}/events.parquet'").fetchone()[0]
        print(f"{out}: {en} events ({mult}x)")

        # Embeddings for the similarity tier (q47/q99/q108/q214): copies get
        # offset vec_ids and a tiny per-copy component nudge (1e-4 * copy),
        # so every cross-copy pair is a genuine near-duplicate (cosine just
        # under 1) — LSH bands / IVF cells / PQ buckets densify super-
        # linearly while vector count grows linearly, the adversarial shape
        # for embedding-dedup scaling. Labels ride unchanged.
        kv = con.sql(f"SELECT max(vec_id) + 1 FROM '{base_dir}/embeddings.parquet'").fetchone()[0]
        con.execute(f"CREATE OR REPLACE VIEW sbase_emb AS SELECT * FROM '{base_dir}/embeddings.parquet'")
        vparts = ["SELECT vec_id, embedding, label FROM sbase_emb"]
        for c in range(1, mult):
            vparts.append(
                f"SELECT vec_id + {c * kv} AS vec_id, "
                f"list_transform(embedding, x -> CAST(x + {c} * 0.0001 AS FLOAT)) AS embedding, "
                f"label FROM sbase_emb")
        con.execute(f"COPY ({' UNION ALL '.join(vparts)} ORDER BY vec_id) "
                    f"TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
        vn = con.sql(f"SELECT count(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
        print(f"{out}: {vn} embeddings ({mult}x)")

        for tbl, (key, _, tmpl) in star.items():
            con.execute(f"CREATE OR REPLACE VIEW sbase_{tbl} AS SELECT * FROM '{base_dir}/{tbl}.parquet'")
            sparts = [f"SELECT * FROM sbase_{tbl}"]
            for c in range(1, mult):
                sparts.append(tmpl.format(ko=c * ko, kc=c * kc, c=c))
            con.execute(f"COPY ({' UNION ALL '.join(sparts)} ORDER BY {key}) "
                        f"TO '{out}/{tbl}.parquet' (FORMAT PARQUET)")
            sn = con.sql(f"SELECT count(*) FROM '{out}/{tbl}.parquet'").fetchone()[0]
            print(f"{out}: {sn} {tbl} ({mult}x)")

if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/tmp/scale_x2", "/tmp/scale_x4", "/tmp/scale_x8"]
    mults = [int(re.search(r"_x(\d+)$", d).group(1)) for d in dirs]
    main(list(zip(mults, dirs)))
