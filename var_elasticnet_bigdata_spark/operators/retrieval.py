"""Lexical retrieval over the document corpus: Okapi BM25 scoring
and top-k ranking for a fixed query-term set (beyond-reference
surface — the retrieval/quality-ranking step of a training-data
pipeline, e.g. scoring documents against a "high quality" seed
query before sampling).

Scale design: the per-document token work is narrow; the only
exploded rows are tokens that MATCH the query terms (the isin filter
sits under the explode's generator output before any shuffle, so the
term-frequency group-by shuffles a few rows per matching doc, not the
corpus's full token stream). Document frequencies per term reduce to
at most ``len(terms)`` rows and broadcast back; corpus stats (N,
avgdl) are one scalar aggregate broadcast into the score expression.
The final top-k is a ``TakeOrderedAndProject`` — no global sort.

Determinism contract for the oracle gate: scores are ROUNDED to 6 dp
BEFORE ranking and ties break on ``doc_id``, so Spark and DuckDB
pick identical top-k sets even under 1-ulp float drift.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by Okapi BM25 against ``query_terms``.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Returns ``(doc_id, n_terms, bm25)`` with ``bm25`` rounded to
    6 dp (ranking happens on the rounded value — see module note).
    """
    from .dedup import norm_sql_spark

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    words = f"filter(split({norm_sql_spark(text_col)}, ' '), w -> w <> '')"
    terms_sql = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    # stage the word array once; explode only the query-matching
    # tokens (a lambda-bearing explode child also keeps
    # InferFiltersFromGenerate from re-inlining the pipeline into a
    # scan filter — see dedup.exploded_shingle_hashes)
    base = df.withColumn("__w", F.expr(words))
    toks = base.select(
        F.col(id_col),
        F.expr("size(__w)").alias("dl"),
        F.explode(
            F.expr(f"filter(__w, t -> t IN ({terms_sql}))")
        ).alias("tok"),
    )
    stats = base.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.expr("size(__w)")).alias("avgdl"),
    )
    tf = toks.groupBy(id_col, "tok", "dl").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum("contrib"), 6).alias("bm25"),
        )
    )
    return scored.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(k)


def duck_bm25_cte(
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """BM25 scoring CTE chain ending in ``bmscore({id_col}, n_terms,
    bm25)`` — shared by the standalone twin and the hybrid-RRF twin
    so both replay byte-identical formula/rounding."""
    from .dedup import NORM_SQL_DUCK

    # escape quotes the same way the Spark twin does (bm25_topk):
    # an apostrophe in a term must not produce malformed oracle SQL
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    return f"""w AS (
          SELECT {id_col},
                 list_filter(string_split({NORM_SQL_DUCK}, ' '), x -> x <> '') AS toks
          FROM {table}),
        stats AS (SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avgdl FROM w),
        tf AS (
          SELECT {id_col}, len(toks) AS dl, t.tok, COUNT(*) AS tf
          FROM w, UNNEST(toks) AS t(tok)
          WHERE t.tok IN ({terms})
          GROUP BY 1, 2, 3),
        dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
        bmscore AS (
          SELECT {id_col}, COUNT(*) AS n_terms,
                 ROUND(SUM(
                   LN(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
                   * tf.tf * {k1 + 1.0}
                   / (tf.tf + {k1} * ({1.0 - b} + {b} * tf.dl / stats.avgdl))
                 ), 6) AS bm25
          FROM tf JOIN dfreq USING (tok) CROSS JOIN stats
          GROUP BY {id_col})"""


def duck_bm25_sql(
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB twin of ``bm25_topk`` — identical formula, rounding,
    and tie-break."""
    return f"""
        WITH {duck_bm25_cte(query_terms, k1, b, id_col, table)}
        SELECT {id_col}, n_terms, bm25
        FROM bmscore
        ORDER BY bm25 DESC, {id_col}
        LIMIT {k}
    """


def rrf_fuse(
    arms: list[DataFrame],
    rrf_k: int = 60,
    id_col: str = "doc_id",
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of ranked
    retrieval arms — the standard hybrid-search combiner: each arm is
    a frame ``(id_col, rank)``; a document's fused score is
    Σ_arms 1/(rrf_k + rank) with 0 for arms that didn't retrieve it.
    Scores round to 6 dp BEFORE the final (rrf DESC, id ASC) rank so
    an engine twin replaying the same formula sees the identical
    argsort. Arms are model-sized (top-k lists), so the fuse is a
    chain of tiny full-outer joins + one bounded window — nothing
    corpus-scale moves. Returns
    ``(id_col, rank, rrf, rank_0..rank_{n-1})``."""
    from functools import reduce

    from pyspark.sql import Window

    renamed = [
        a.select(F.col(id_col), F.col("rank").alias(f"rank_{i}"))
        for i, a in enumerate(arms)
    ]
    j = reduce(
        lambda x, y: x.join(y, id_col, "full_outer"), renamed
    )
    expr = None
    for i in range(len(arms)):
        t = F.when(
            F.col(f"rank_{i}").isNotNull(),
            F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(f"rank_{i}")),
        ).otherwise(F.lit(0.0))
        expr = t if expr is None else expr + t
    w = Window.orderBy(F.col("rrf").desc(), F.col(id_col).asc())
    return (
        j.withColumn("rrf", F.round(expr, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            id_col,
            "rank",
            "rrf",
            *[F.col(f"rank_{i}").cast("int").alias(f"rank_{i}")
              for i in range(len(arms))],
        )
    )


def bm25_reference(
    docs: list[tuple[int, list[str]]],
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> dict[int, float]:
    """Plain-Python oracle for unit tests: exact BM25 per doc id."""
    n = len(docs)
    avgdl = sum(len(t) for _, t in docs) / n
    dfreq = {
        t: sum(1 for _, toks in docs if t in toks) for t in query_terms
    }
    out: dict[int, float] = {}
    for doc_id, toks in docs:
        s = 0.0
        dl = len(toks)
        for t in query_terms:
            tf = toks.count(t)
            if tf == 0 or dfreq[t] == 0:
                continue
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        if s > 0:
            out[doc_id] = s
    return out


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document — the keyword-extraction /
    document-vector op of a text pipeline. ``score = tf · ln(N/df)``
    with ``df`` = number of documents containing the term.

    Scale: one token-keyed shuffle builds (doc, term, tf); document
    frequencies reduce vocabulary-sized and join back on the uniform
    term key; the final per-document rank is a window PARTITIONED by
    document (never global). Scores round to 6 dp before ranking and
    ties break on the term string, so engines agree on the exact
    top-k set.
    """
    from pyspark.sql import Window

    from .dedup import norm_sql_spark

    words = f"filter(split({norm_sql_spark(text_col)}, ' '), w -> w <> '')"
    toks = df.select(
        F.col(id_col), F.explode(F.expr(words)).alias("tok")
    )
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("tok")
    )
    return (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "tok", "tfidf")
    )


def cluster_top_terms(
    emb: DataFrame,
    docs: DataFrame,
    nlist: int = 16,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Semantic-cluster LABELING — the BERTopic-style c-TF-IDF report
    a curation pipeline runs after clustering its embedding corpus:
    per trained k-means cell, the top-``k`` terms of the member
    documents, scored ``tf_cell · ln(nlist / df_cells)`` where
    ``df_cells`` = number of cells containing the term (cluster-level
    IDF: terms every cluster shares score to ~0, cell-specific
    vocabulary rises). Answers "what IS cluster 7" before deciding
    SemDeDup thresholds or mixture weights per topic.

    Scale shape: one distributed Lloyd step trains the cells (only
    nlist×d moves), assignment is the constant-folded argmax pass (no
    join), the token shuffle is the same single (cell|doc)-keyed
    reduce TF-IDF pays, and the per-cell rank window partitions on
    cell — nothing global, nothing doc×doc. Returns
    ``(cell, rank, tok, score)``; scores round to 6 dp before the
    (score DESC, tok ASC) rank so both engines pick identical sets.
    """
    from pyspark.sql import Window

    from .dedup import norm_sql_spark
    from .similarity import centroid_matrix, kmeans_refine, with_assigned_cell

    rows = kmeans_refine(emb, nlist, id_col=id_col, vec_col=vec_col).collect()
    # centroid_matrix fails loudly if refinement emptied a cell —
    # compacting survivors would shift the emitted cell labels off the
    # twin's original refine cell ids (ADVICE r8 #3)
    C = centroid_matrix(rows, nlist)
    # RAW vectors into the argmax (its contract: positive-scale
    # invariant) — normalizing first wraps every one of the nlist
    # folded dot products around a nested norm-fold expression, which
    # CollapseProject re-inlines nlist×d times per row (measured 14 s
    # for a 2000-row assignment; raw column: milliseconds)
    v = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    assigned = with_assigned_cell(v, C, vec_expr="__v").select(
        F.col(id_col).alias(doc_id_col), "cell"
    )

    words = f"filter(split({norm_sql_spark(text_col)}, ' '), w -> w <> '')"
    toks = docs.select(
        F.col(doc_id_col), F.explode(F.expr(words)).alias("tok")
    )
    tf = (
        toks.join(assigned, doc_id_col)
        .groupBy("cell", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfc = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("dfc"))
    w = Window.partitionBy("cell").orderBy(
        F.col("score").desc(), F.col("tok")
    )
    return (
        tf.join(dfc, "tok")
        .withColumn(
            "score",
            F.round(
                F.col("tf") * F.log(F.lit(float(nlist)) / F.col("dfc")), 6
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("cell", "rank", "tok", "score")
    )


def duck_tfidf_sql(
    k: int = 3, id_col: str = "doc_id", table: str = "documents"
) -> str:
    """DuckDB twin of ``tfidf_top_terms``."""
    from .dedup import NORM_SQL_DUCK

    return f"""
        WITH toks AS (
          SELECT {id_col}, t.tok
          FROM {table},
               UNNEST(list_filter(string_split({NORM_SQL_DUCK}, ' '),
                                  x -> x <> '')) AS t(tok)),
        n AS (SELECT COUNT(*) AS n_docs FROM {table}),
        tf AS (SELECT {id_col}, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
        scored AS (
          SELECT tf.{id_col}, tf.tok,
                 ROUND(tf.tf * LN(n.n_docs / dfreq.df), 6) AS tfidf
          FROM tf JOIN dfreq USING (tok) CROSS JOIN n),
        ranked AS (
          SELECT {id_col}, tok, tfidf,
                 CAST(ROW_NUMBER() OVER (PARTITION BY {id_col}
                      ORDER BY tfidf DESC, tok) AS INT) AS rank
          FROM scored)
        SELECT {id_col}, rank, tok, tfidf FROM ranked WHERE rank <= {k}
    """
