"""DuckDB oracle SQL for the pipeline operators (dedup / similarity / text
analysis / multimodal).

Each function returns SQL that recomputes the operator's expected output from
the driver's registered views using DuckDB list functions. Hashing is md5
(portable across engines); floating point is double with identical
accumulation order and 6-dp rounding.

Dialect gotchas encoded here: DuckDB list_slice is 1-based with INCLUSIVE end
(Spark F.slice takes a LENGTH); DuckDB regexp_replace needs the 'g' flag to
replace all; DuckDB list_cosine_similarity computes in float32 so we build
cosine from list_dot_product over DOUBLE[] instead.
"""

from __future__ import annotations

# corpus with injected exact duplicates (shared by Spark + DuckDB sides)
DUP_CORPUS_SQL = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
"""

_TOKS = "string_split_regex(trim(lower(text)), ' +')"
_TOKS_CASED = "string_split_regex(trim(text), ' +')"


def dedup_exact_sql() -> str:
    return f"""
        WITH corpus AS ({DUP_CORPUS_SQL}),
        h AS (SELECT doc_id, md5(text) AS text_hash FROM corpus),
        g AS (SELECT doc_id,
                     min(doc_id) OVER (PARTITION BY text_hash) AS canonical_id,
                     count(*) OVER (PARTITION BY text_hash) AS group_size
              FROM h)
        SELECT doc_id, canonical_id, group_size FROM g WHERE group_size > 1
    """


def _shingle_list(tok_expr: str, n: int) -> str:
    return (
        f"list_distinct(list_transform(range(0, greatest(len({tok_expr}) - {n}, 0) + 1), "
        f"i -> array_to_string(list_slice({tok_expr}, i + 1, i + {n}), ' ')))"
    )


def minhash_pairs_sql(shingle_n: int = 3, k: int = 8, bands: int = 4) -> str:
    rows = k // bands
    mh_cols = ",\n               ".join(
        f"list_aggregate(list_transform(shingles, s -> md5(s || '#{i}')), 'min') AS mh_{i}"
        for i in range(k)
    )
    band_selects = "\n            UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS band_key FROM sig".format(
            b=b,
            key=" || '|' || ".join(f"mh_{i}" for i in range(b * rows, (b + 1) * rows)),
        )
        for b in range(bands)
    )
    return f"""
        WITH corpus AS ({DUP_CORPUS_SQL}),
        sh AS (SELECT doc_id, {_shingle_list(_TOKS_CASED, shingle_n)} AS shingles FROM corpus),
        sig AS (SELECT doc_id,
               {mh_cols}
               FROM sh),
        bands AS (
            {band_selects}
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """


def jaccard_sql(shingle_n: int = 3, k: int = 8, bands: int = 4) -> str:
    return f"""
        WITH corpus AS ({DUP_CORPUS_SQL}),
        pairs AS ({minhash_pairs_sql(shingle_n, k, bands)}),
        sh AS (SELECT doc_id, {_shingle_list(_TOKS_CASED, shingle_n)} AS shingles FROM corpus)
        SELECT p.doc_a, p.doc_b,
               round(len(list_intersect(a.shingles, b.shingles))::DOUBLE /
                     (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))),
                     6) AS jaccard
        FROM pairs p
        JOIN sh a ON a.doc_id = p.doc_a
        JOIN sh b ON b.doc_id = p.doc_b
    """


def dedup_components_sql(shingle_n: int = 3, k: int = 8, bands: int = 4) -> str:
    """Connected components over the minhash candidate graph via a DuckDB
    recursive CTE: reach(node, lab) enumerates every component member each
    node can reach (UNION dedup terminates the recursion), then min(lab)
    per node is the component id — the same fixpoint the engine's min-label
    propagation (pipeline/dedup.py dedup_components) converges to."""
    return f"""
        WITH RECURSIVE corpus AS ({DUP_CORPUS_SQL}),
        pairs AS ({minhash_pairs_sql(shingle_n, k, bands)}),
        e AS (
            SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION
            SELECT doc_b AS u, doc_a AS v FROM pairs
        ),
        reach AS (
            SELECT u AS node, u AS lab FROM e
            UNION
            SELECT e.v AS node, reach.lab AS lab
            FROM reach JOIN e ON e.u = reach.node
        )
        SELECT node AS doc_id, min(lab) AS component_id
        FROM reach GROUP BY node
    """


def dedup_canonical_sql(
    shingle_n: int = 3, k: int = 8, bands: int = 4, threshold: float = 0.5
) -> str:
    """End-to-end dedup chain oracle: jaccard-verified LSH pairs → recursive
    reachability components → canonical id per corpus doc (self when in no
    verified pair)."""
    return f"""
        WITH RECURSIVE corpus AS ({DUP_CORPUS_SQL}),
        verified AS (
            SELECT doc_a, doc_b FROM ({jaccard_sql(shingle_n, k, bands)}) j
            WHERE j.jaccard >= {threshold}
        ),
        e AS (
            SELECT doc_a AS u, doc_b AS v FROM verified
            UNION
            SELECT doc_b AS u, doc_a AS v FROM verified
        ),
        reach AS (
            SELECT u AS node, u AS lab FROM e
            UNION
            SELECT e.v AS node, reach.lab AS lab
            FROM reach JOIN e ON e.u = reach.node
        ),
        comp AS (
            SELECT node AS doc_id, min(lab) AS component_id
            FROM reach GROUP BY node
        )
        SELECT c.doc_id,
               COALESCE(comp.component_id, c.doc_id) AS canonical_id
        FROM corpus c LEFT JOIN comp USING (doc_id)
    """


def simhash_sql(bits: int = 16) -> str:
    hexchars = bits // 4
    h = f"CAST(('0x' || substr(md5(t), 1, {hexchars})) AS BIGINT)"
    sums = ",\n               ".join(
        f"list_aggregate(list_transform(tk, t -> CASE WHEN ({h} >> {j}) & 1 = 1 THEN 1 ELSE -1 END), 'sum') AS s_{j}"
        for j in range(bits)
    )
    sim = " + ".join(f"CASE WHEN s_{j} > 0 THEN {2 ** j} ELSE 0 END" for j in range(bits))
    return f"""
        WITH toks AS (SELECT doc_id, {_TOKS_CASED} AS tk FROM documents),
        sums AS (SELECT doc_id,
               {sums}
               FROM toks)
        SELECT doc_id, CAST({sim} AS BIGINT) AS simhash FROM sums
    """


def token_counts_sql() -> str:
    return f"""
        SELECT doc_id,
               CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
               CAST(list_aggregate(list_transform({_TOKS},
                    t -> CAST(ceil(length(t) / 4.0) AS BIGINT)), 'sum') AS BIGINT) AS n_subwords,
               CAST(length(text) AS BIGINT) AS n_chars_measured
        FROM documents
    """


def language_id_sql(stopwords: dict, trigrams: dict) -> str:
    """Two-stage heuristic: stopword argmax, character-trigram fallback on
    silence/tie — mirrors text_analysis.language_id expression-for-expression."""
    tris = (
        "list_transform(range(1, greatest(length(trim(lower(text))) - 2, 1) + 1), "
        "i -> substr(trim(lower(text)), CAST(i AS INT), 3))"
    )
    sw_structs = ", ".join(
        "{{'neg_hits': -len(list_filter({toks}, t -> list_contains({lst}, t))), "
        "'lang': '{lang}', "
        "'hits': len(list_filter({toks}, t -> list_contains({lst}, t)))}}".format(
            toks=_TOKS,
            lang=lang,
            lst="[" + ", ".join(f"'{w}'" for w in words) + "]",
        )
        for lang, words in sorted(stopwords.items())
    )
    tri_structs = ", ".join(
        "{{'neg_hits': -len(list_filter(tg, t -> list_contains({lst}, t))), "
        "'lang': '{lang}', "
        "'hits': len(list_filter(tg, t -> list_contains({lst}, t)))}}".format(
            lang=lang,
            lst="[" + ", ".join(f"'{t}'" for t in trigrams[lang]) + "]",
        )
        for lang in sorted(stopwords)
    )
    return f"""
        WITH t AS (SELECT doc_id, text, {tris} AS tg FROM documents),
        scored AS (
            SELECT doc_id,
                   list_sort([{sw_structs}]) AS sw,
                   list_sort([{tri_structs}])[1] AS tri_best
            FROM t
        ),
        d AS (
            SELECT doc_id, sw[1] AS best, sw[2] AS second, tri_best,
                   (sw[1].hits = 0 OR sw[1].hits = sw[2].hits) AS ambiguous
            FROM scored
        )
        SELECT doc_id,
               CASE WHEN ambiguous THEN tri_best.lang ELSE best.lang END AS detected_lang,
               CAST(best.hits AS INT) AS stopword_hits,
               CAST(CASE WHEN ambiguous THEN tri_best.hits ELSE 0 END AS INT) AS trigram_hits,
               ambiguous AS used_trigram_fallback
        FROM d
    """


def quality_score_sql(en_stopwords: list) -> str:
    lst = "[" + ", ".join(f"'{w}'" for w in en_stopwords) + "]"
    return f"""
        WITH b AS (
            SELECT doc_id,
                   length(text) AS nc,
                   {_TOKS} AS tk,
                   length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct
            FROM documents
        )
        SELECT doc_id,
               CAST(nc AS BIGINT) AS n_chars_measured,
               CAST(len(tk) AS BIGINT) AS n_tokens,
               round(nc / greatest(len(tk), 1), 6) AS mean_word_len,
               round(punct / greatest(nc, 1), 6) AS punct_ratio,
               round(len(list_filter(tk, t -> list_contains({lst}, t))) / greatest(len(tk), 1), 6) AS stopword_ratio,
               round(len(list_distinct(tk)) / greatest(len(tk), 1), 6) AS distinct_token_ratio,
               round(least(len(tk) / 100.0, 1.0) * (len(list_distinct(tk)) / greatest(len(tk), 1)), 6) AS quality
        FROM b
    """


def fingerprint_sql(shingle_n: int = 5) -> str:
    return f"""
        SELECT doc_id,
               list_aggregate(list_transform({_shingle_list(_TOKS, shingle_n)}, s -> md5(s)), 'min') AS fingerprint
        FROM documents
    """


def ann_sql(k: int = 5, query_mod: int = 50, bucketed: bool = False) -> str:
    bucket_cond = "AND e.label = q.label" if bucketed else ""
    return f"""
        WITH q AS (SELECT vec_id AS query_id, embedding, label FROM embeddings
                   WHERE vec_id % {query_mod} = 0),
        scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   round(list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) /
                         (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                          sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 6) AS cosine
            FROM embeddings e, q
            WHERE e.vec_id <> q.query_id {bucket_cond}
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cosine,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= {k}
    """


def media_features_sql() -> str:
    """Oracle for the REAL header decoders: rebuild the payload hex with the
    shared expression (multimodal.media_payload_hex_sql), predict the parsed
    dimensions from the same md5 bytes, and check the checksum against the
    whole constructed payload."""
    from .multimodal import media_payload_hex_sql

    hexpr = media_payload_hex_sql("duck")
    b = [f"('0x' || substr(md5(text), {1 + 2 * i}, 2))::INT" for i in range(4)]
    return f"""
        WITH p AS (
            SELECT doc_id, (doc_id % 4) AS k, {hexpr} AS ph,
                   1 + {b[0]} AS w, 1 + {b[1]} AS h,
                   1 + ({b[2]}) % 2 AS t, 1 + ({b[3]}) % 4 AS r
            FROM documents
        )
        SELECT CAST(doc_id AS BIGINT) AS media_id,
               ['image', 'audio', 'video', 'image'][k + 1] AS kind,
               ['png', 'wav', 'mp4', 'jpeg'][k + 1] AS container,
               CAST(length(ph) / 2 AS BIGINT) AS n_bytes,
               CAST(CASE WHEN k = 1 THEN 0 ELSE w END AS INT) AS width,
               CAST(CASE WHEN k = 1 THEN 0 ELSE h END AS INT) AS height,
               CAST(CASE k WHEN 0 THEN 1 WHEN 1 THEN 16 * r
                           WHEN 2 THEN 0 ELSE 1 END AS INT) AS n_frames,
               -- wav: 16·r frames at 8000 Hz → 2·r ms; mp4: mvhd 500·r ms
               CAST(CASE k WHEN 1 THEN 2 * r WHEN 2 THEN 500 * r
                           ELSE 0 END AS BIGINT) AS duration_ms,
               -- wav: mono fmt; mp4: t trak boxes
               CAST(CASE k WHEN 1 THEN 1 WHEN 2 THEN t
                           ELSE 0 END AS INT) AS n_tracks,
               ph AS checksum_hex
        FROM p
    """


def ann_ivf_lsh_sql(k: int = 5, query_mod: int = 50, n_planes: int = 4, dim: int = 64) -> str:
    """Hyperplane-LSH IVF oracle: recompute the md5-seeded planes, the bucket
    assignment (sign of round(dot,6), same ULP guard as the engine), then
    exact top-k within the query's bucket. Single probe."""
    plane = (
        f"list_transform(range(0, {dim}), j -> "
        f"('0x' || substr(md5('hp-' || i || '-' || j), 1, 8))::BIGINT "
        f"/ 4294967295.0 * 2 - 1)"
    )
    return f"""
        WITH planes AS (
            SELECT i AS plane, {plane} AS pv FROM range(0, {n_planes}) t(i)
        ),
        b AS (
            SELECT e.vec_id, e.embedding,
                   CAST(sum(CASE WHEN round(list_dot_product(e.embedding::DOUBLE[], p.pv), 6) >= 0
                                 THEN (1 << p.plane) ELSE 0 END) AS INT) AS bucket
            FROM embeddings e, planes p
            GROUP BY e.vec_id, e.embedding
        ),
        q AS (SELECT vec_id AS query_id, embedding, bucket FROM b
              WHERE vec_id % {query_mod} = 0),
        scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   round(list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) /
                         (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                          sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 6) AS cosine
            FROM b e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.query_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cosine,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= {k}
    """


def ann_ivf_kmeans_sql(
    k: int = 5,
    query_mod: int = 50,
    n_clusters: int = 8,
    iters: int = 3,
    dim: int = 64,
    n_probes: int = 2,
) -> str:
    """Lloyd's k-means IVF oracle: replicates similarity.kmeans_fit exactly —
    init = vectors of the n_clusters lowest ids; per iteration, assignment is
    argmin over 6dp-ROUNDED squared distance (cluster-id tie-break) and the
    update rounds each per-dimension avg to 6dp (empty clusters keep the
    previous centroid); queries probe their n_probes nearest cells. The
    rounding grain (1e-6) dwarfs cross-engine FP-sum-order noise (~1e-12), so
    the whole fit+search is value-hash comparable — same portability pattern
    as ann_ivf_lsh_sql."""
    dist = (
        "list_aggregate(list_transform(list_zip(e.v, {c}.cv), "
        "z -> (z[1] - z[2]) * (z[1] - z[2])), 'sum')"
    )
    ctes = [
        "emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"""cent0 AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS c,
                   v AS cv
            FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT {n_clusters})
        )""",
    ]
    for it in range(1, iters + 1):
        prev = f"cent{it - 1}"
        d = dist.format(c="c0")
        ctes.append(f"""asg{it} AS (
            SELECT vec_id, v, c FROM (
                SELECT e.vec_id, e.v, c0.c,
                       row_number() OVER (PARTITION BY e.vec_id
                                          ORDER BY round({d}, 6), c0.c) AS rn
                FROM emb e CROSS JOIN {prev} c0
            ) WHERE rn = 1
        )""")
        ctes.append(f"""upd{it} AS (
            SELECT c, pos.i AS pos, round(avg(v[pos.i]), 6) AS m
            FROM asg{it}, (SELECT unnest(range(1, {dim + 1})) AS i) pos
            GROUP BY c, pos.i
        )""")
        ctes.append(f"""cent{it} AS (
            SELECT p.c, COALESCE(u.cv, p.cv) AS cv
            FROM {prev} p LEFT JOIN (
                SELECT c, list(m ORDER BY pos) AS cv FROM upd{it} GROUP BY c
            ) u USING (c)
        )""")
    d = dist.format(c="c0")
    ctes.append(f"""fin AS (
        SELECT e.vec_id, e.v, c0.c,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY round({d}, 6), c0.c) AS rn
        FROM emb e CROSS JOIN cent{iters} c0
    )""")
    ctes.append("e_asg AS (SELECT vec_id, v, c FROM fin WHERE rn = 1)")
    ctes.append(
        f"""q_asg AS (
            SELECT vec_id AS query_id, v, c FROM fin
            WHERE vec_id % {query_mod} = 0 AND rn <= {n_probes}
        )"""
    )
    ctes.append("""scored AS (
        SELECT DISTINCT q.query_id, e.vec_id AS neighbor_id,
               round(list_dot_product(q.v, e.v) /
                     (sqrt(list_dot_product(q.v, q.v)) *
                      sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
        FROM e_asg e JOIN q_asg q ON e.c = q.c AND e.vec_id <> q.query_id
    )""")
    ctes.append("""ranked AS (
        SELECT query_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM scored
    )""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
        SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= {k}
    """
    )
