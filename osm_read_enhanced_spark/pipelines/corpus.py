"""Training-corpus pipeline, composed end-to-end (round 5): the full
path a 100-TB text-corpus build runs, assembled from this round's and
prior rounds' independently-tested operators — this module is the
composition, not new math:

  raw HTML pages
    → extract + boilerplate filter   (functions.html, q64 chain)
    → exact dedup                    (operators.dedup.exact_dedup rule)
    → near-dup vs committed index    (operators.dedup.incremental_dedup)
    → subword token budget           (functions.bpe, committed merges)
    → deterministic shuffle-shards   (operators.sharding)
    → committed export + lineage     (sources.iceberg_lite)

Stage semantics are the deterministic, oracle-mirrorable variants the
individual queries use (min-id wins exact dedup; smaller-id-wins
within-batch near-dup; seeded md5 shard key), so the ENTIRE pipeline's
survivor set + shard assignment is reproducible run-to-run and
mirrored live in SQL by q68.

Scale shape: extraction/quality are narrow per-row JVM chains inside
the scan stage; exact dedup is one hash shuffle; the near-dup probe is
a band-bucket equi-join against the band-partitioned index; the token
budget joins a vocab-sized Arrow stage back to the corpus; sharding is
a narrow projection (hash mode). Nothing collects rows on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_corpus(
    pages: DataFrame,
    index: DataFrame | None = None,
    id_col: str = "doc_id",
    html_col: str = "html",
    min_chars: int = 20,
    link_density_max: float = 0.5,
    dedup_threshold: float = 0.5,
    n_shards: int = 8,
    seed: int = 0,
    with_token_budget: bool = True,
) -> DataFrame:
    """pages(id, html) → surviving corpus rows with
    (text, n_links, link_density, n_words, n_bpe_tokens, shard_key,
    shard) — only rows that pass boilerplate, exact-dedup (min id per
    identical text) and near-dup (vs ``index`` if given, and within the
    batch) filters survive.

    ``index``: a committed (id, sig, band, bucket) MinHash index from
    prior runs (operators.dedup.minhash_index /
    read_minhash_index); None → first run, batch-internal dedup only.
    """
    from ..functions.html import html_stats_df
    from ..operators.dedup import incremental_dedup
    from ..operators.sharding import shuffle_shard

    # staged-projection extraction (r6): text/anchor-text computed once
    # per row instead of re-derived per stat — same values as
    # html_stats_cols (functions/html.py)
    s = html_stats_df(
        pages,
        F.col(html_col),
        keep_cols=(id_col,),
        link_density_max=link_density_max,
        min_chars=min_chars,
    )
    extracted = s.filter(~F.col("is_boilerplate")).select(
        F.col(id_col),
        "text",
        F.col("n_links").cast("long").alias("n_links"),
        (F.floor(F.col("link_density") * 10000 + 0.5) / 10000).alias("link_density"),
    )

    # exact dedup: min id per identical extracted text — keyed on
    # md5(text) so the shuffle carries 32-byte keys, not document bodies.
    # ``hashed`` (the 6-regexp extraction chain + md5) feeds BOTH sides
    # of the semi join and, through ``exact``, the signature stage and
    # the survivor join — persist it so the regex chain runs once per
    # pipeline instead of ~6x (VERDICT r5 #4). Cache lifetime contract:
    # the cache belongs to this pipeline DataFrame; a caller running
    # many build_corpus batches in one session should release it after
    # the batch's terminal action (spark.catalog.clearCache() or
    # rebuilding per batch) — the iceberg-lite export path is one
    # action, so the cache is read exactly as many times as needed.
    hashed = extracted.withColumn("_h", F.md5("text")).persist()
    keep_exact = hashed.groupBy("_h").agg(F.min(id_col).alias(id_col))
    exact = (
        hashed.join(keep_exact, ["_h", id_col], "left_semi").drop("_h")
    )

    # near-dup: vs the committed index (if any) + within the batch
    flags = incremental_dedup(
        exact, index, threshold=dedup_threshold, id_col=id_col, text_col="text"
    )
    survivors = exact.join(
        flags.filter(F.col("kept")).select(id_col), id_col, "left_semi"
    )

    if with_token_budget:
        from ..functions.bpe import subword_token_counts

        budget = subword_token_counts(survivors, id_col=id_col, text_col="text")
        survivors = survivors.join(budget, id_col)

    return shuffle_shard(survivors, n_shards, seed=seed, id_col=id_col)


def export_corpus(
    corpus: DataFrame,
    table_path: str,
    run_id: str | None = None,
    resume: bool = True,
) -> list[dict]:
    """Commit the sharded corpus through the iceberg-lite manifest —
    one atomic partition per shard with observe-verified row counts; a
    killed export resumes from the last committed shard.

    ``run_id`` prefixes the partition ids (``run-shard``) so successive
    batches APPEND to the same table instead of colliding with the
    previous run's committed shard ids (resume semantics are per
    partition id — without a distinct run_id, a second run over the
    same path is a no-op, which is the right behavior for a re-run of
    the SAME batch but not for a new one)."""
    from ..sources.iceberg_lite import write_partitioned

    if run_id is None:
        return write_partitioned(corpus, table_path, "shard", resume=resume)
    keyed = corpus.withColumn(
        "pid", F.concat(F.lit(str(run_id)), F.lit("-"), F.col("shard"))
    )
    return write_partitioned(keyed, table_path, "pid", resume=resume)
