"""Derive a larger scale-factor soak corpus from /root/testdata/sf0.1.

VERDICT r4 item 3: every hash gate runs at sf0.01/sf0.1; grain-dependent
residuals (k-means 6 dp half-way ties, oracle float-sum ordering, sessionize
boundaries) have vanishing per-row probability but 10× the chances at 10×
the rows. The sandbox's largest driver-generated sf is 0.1, so this tool
K-fold replicates it DETERMINISTICALLY (no external data, no RNG):

  documents:  doc_id + i·N;  text || ' copyi' for i>0 (keeps the corpus
              mostly-distinct: verbatim replicas would turn every doc into
              a dedup clique and explode the candidate graph); n_chars
              recomputed to keep the column's invariant (== length(text))
  embeddings: vec_id + i·N; vectors unchanged (deterministic float ties are
              broken by neighbor_id on both engines)
  events:     event_id + i·N, user_id + i·U (user cardinality scales with
              the corpus — the realistic shape); ts/value unchanged
  TPC-H dims: symlinked (no gate reads them)

Usage: python tools/make_soak_sf.py [K] [out_dir]
Then:  python tools/check_oracle.py <out_dir>
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DIMS = "region nation customer supplier part orders lineitem".split()


def main(k: int = 10, out: str = "/tmp/ukeeper_soak/sf1x"):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW src_documents AS SELECT * FROM '{SRC}/documents.parquet'")
    con.sql(f"CREATE VIEW src_embeddings AS SELECT * FROM '{SRC}/embeddings.parquet'")
    con.sql(f"CREATE VIEW src_events AS SELECT * FROM '{SRC}/events.parquet'")
    n_docs = con.sql("SELECT count(*) FROM src_documents").fetchone()[0]
    n_vecs = con.sql("SELECT count(*) FROM src_embeddings").fetchone()[0]
    n_ev = con.sql("SELECT count(*) FROM src_events").fetchone()[0]
    n_users = con.sql(
        "SELECT max(user_id) + 1 FROM src_events"
    ).fetchone()[0]

    con.sql(
        f"""
        COPY (
            SELECT d.doc_id + i * {n_docs} AS doc_id,
                   CASE WHEN i = 0 THEN d.text
                        ELSE d.text || ' copy' || i END AS text,
                   d.lang, d.source,
                   CAST(length(CASE WHEN i = 0 THEN d.text
                        ELSE d.text || ' copy' || i END) AS BIGINT) AS n_chars
            FROM src_documents d CROSS JOIN range(0, {k}) t(i)
            ORDER BY doc_id
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.sql(
        f"""
        COPY (
            SELECT e.vec_id + i * {n_vecs} AS vec_id, e.embedding, e.label
            FROM src_embeddings e CROSS JOIN range(0, {k}) t(i)
            ORDER BY vec_id
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    con.sql(
        f"""
        COPY (
            SELECT e.event_id + i * {n_ev} AS event_id, e.ts,
                   e.user_id + i * {n_users} AS user_id,
                   e.event_type, e.value, e.props
            FROM src_events e CROSS JOIN range(0, {k}) t(i)
            ORDER BY event_id
        ) TO '{out}/events.parquet' (FORMAT PARQUET)
        """
    )
    for t in DIMS:
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)
    for t in ("documents", "embeddings", "events"):
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"soak corpus at {out} (K={k})")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 10,
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/ukeeper_soak/sf1x",
    )
