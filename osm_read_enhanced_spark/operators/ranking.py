"""Text retrieval ranking (round 4 breadth): BM25 scoring + top-k over
a document table — the standard lexical-retrieval scorer a training-
data pipeline uses for query-based corpus slicing and dedup triage.

Public Okapi BM25 (Robertson & Zaragoza 2009, the +1 idf variant that
keeps weights positive):

    idf(t)      = ln( (N - df_t + 0.5) / (df_t + 0.5) + 1 )
    score(q, d) = Σ_{t∈q} idf(t) · tf_td·(k1+1) / (tf_td + k1·(1 - b + b·|d|/avgdl))

Everything is plain DataFrame algebra — explode to (doc, term) rows,
map-side-combinable aggregations, a window top-k. No UDFs; a DuckDB
oracle mirrors it verbatim (q61).

Scale shape (round 6 rewrite — guide §1.2 "the distributed algorithm
first"): exactly two passes over the corpus text, one Spark job —
  - pass 1 (a broadcast single-row subtree): (N, avgdl) from a narrow
    per-row dl computed with regexp_count (token count = whitespace-run
    count + 1 on the trimmed text) — no split, no array allocation;
  - pass 2: the explode filtered to query terms BEFORE the group-by,
    with dl RIDING ALONG as a group key (functionally dependent on the
    doc id) so the round-5 third pass — re-deriving dl and joining it
    back on doc id — is gone, join included. The regex split is
    materialized ONCE as a column (inline uses under the Generate each
    re-evaluate it — measured 3x the tokenize cost; CollapseProject
    keeps the two-step projection because split is not cheap,
    SPARK-36718).
df is a count-over-window on tf's (doc, term) rows (tf has exactly one
row per matching (doc, term)) instead of a second aggregation over a
persisted tf, which removes the persist (r5 ADVICE: never released)
and the broadcast build. (N, avgdl) join in as a broadcast single-row
cross join instead of a driver .first(), so the whole query is ONE
Spark job and the degenerate all-empty corpus needs no special case:
no tokens ⇒ tf is empty ⇒ the result is empty with the right schema.

(A per-term columnar tf via size(ws) − size(array_remove(ws, t)) was
measured at sf1.0 and REJECTED: 3.6 s vs 2.4 s — each array_remove
rebuilds the token array per row, so 5 terms cost 5 array copies/row,
more than the explode + tiny shuffles it avoids.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, rank, score) top-k documents for the term list.

    Tokens = whitespace words of the lowercased text (tf counts every
    occurrence, unlike the dedup ops' distinct sets). Scores are
    floor(x·10⁴+0.5)/10⁴-rounded with doc-id tie-break so ordering is
    reproducible in the SQL oracle.
    """
    from ..session import widen

    trimmed = F.trim(F.lower(text_col))
    words = F.split(trimmed, r"\s+")
    # distribute the tokenize across the session's parallelism when the
    # scan plans to a handful of partitions (single-row-group parquet):
    # one hash exchange of the narrow (id, text) projection, REUSED by
    # both passes (ReuseExchange: identical subplans), unlocks n-wide
    # regex work; a no-op at real scale. min_bytes is low because the
    # per-byte tokenize cost is high (regex split) — measured r6:
    # 2.42 → 1.76 s on the 5.7 MB sf1.0 corpus
    docs = widen(
        docs.select(F.col(id_col), F.col(text_col)),
        by=id_col,
        min_bytes=2 * 1024 * 1024,
    )
    # dl without tokenizing: tokens of the trimmed text = whitespace
    # runs + 1 (identical to size(split(trimmed, '\s+')) for nonempty
    # trimmed text; the empty case is the when-guard)
    dl_narrow = (
        F.when(F.length(trimmed) == 0, F.lit(0))
        .otherwise(F.regexp_count(trimmed, F.lit(r"\s+")) + 1)
    )
    stats = F.broadcast(
        docs.select(dl_narrow.alias("dl")).agg(
            F.count("*").cast("double").alias("_n"),
            F.avg(F.when(F.col("dl") > 0, F.col("dl"))).alias("_avgdl"),
        )
    )
    terms = F.array(*[F.lit(t) for t in query_terms])
    # dl from the materialized token array (same value as dl_narrow):
    # split of TRIMMED text on \s+ can only produce an empty token for
    # the all-whitespace case
    dl_ws = (
        F.when(F.element_at(F.col("_ws"), 1) == "", F.lit(0))
        .otherwise(F.size("_ws"))
    )
    tf = (
        docs.select(F.col(id_col), words.alias("_ws"))
        .select(F.col(id_col), dl_ws.alias("dl"), F.explode("_ws").alias("w"))
        .filter((F.length("w") > 0) & F.array_contains(terms, F.col("w")))
        .groupBy(id_col, "dl", "w")
        .agg(F.count("*").alias("tf"))
    )
    # df_t = distinct docs containing t = row count per term in tf
    # (tf is one row per matching (doc, term))
    df_w = F.count("*").over(Window.partitionBy("w"))
    idf = F.log(
        (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    contrib = idf * (
        F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("_avgdl")))
    )
    scored = (
        tf.withColumn("df", df_w)
        .crossJoin(stats)
        .withColumn("_c", contrib)
        .groupBy(id_col)
        .agg((F.floor(F.sum("_c") * 10000 + 0.5) / 10000).alias("score"))
    )
    # distributed top-k (TakeOrderedAndProject: per-partition heads +
    # driver merge of k rows) instead of a single-partition global
    # window over every matching doc — the scale-correct shape when
    # query terms are common. Ranks are then numbered over k rows only.
    topk = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select(id_col, "rank", "score")
    )
