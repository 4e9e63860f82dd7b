"""Round-9 operators: line/segment-level boilerplate removal.

The canonical pretraining-pipeline cleanup step (CCNet, RefinedWeb,
Dolma): a LINE that recurs across many documents is boilerplate
(headers, footers, nav bars, cookie banners) and is dropped from every
document while the rest of each document survives in order. The
reference delegates its query surface to Spark+Iceberg (SURVEY §0;
reference README.md:8-11), so LLM-corpus operators like this one are
part of the engine-parity inventory rather than ports of reference
code.

The synthetic `documents` fixture has no newlines, so the SEGMENTER
here is a deterministic fixed-width word window (_BP_W words); in a
real crawl the segmenter is `split(text, '\\n')` and everything
downstream — the distributed document-frequency count, the drop, the
order-preserving reassembly — is identical. Segmentation is expressed
identically in Spark (higher-order array functions, codegen, no UDF)
and DuckDB (list comprehension + generate_subscripts), so the oracle
is exact.

Scale notes (100 TB): segmentation is map-only; the segment
document-frequency count partial-aggregates map-side before its one
exchange, so a viral boilerplate line costs one partial count per
task, not a hot reduce key; the drop is a join against the
one-row-per-distinct-segment count side (no row blow-up — the right
side is unique on the join key; AQE skew-join splits any hot LEFT
key); reassembly shuffles once on doc_id with collect_list +
array_sort (a document's own segments — bounded by document length,
never by corpus size). No driver-side collects anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_relative_io_spark.sources.tables import load_table

_BP_W = 10  # words per segment (the '\n' stand-in for this corpus)
_BP_K = 3   # a segment in >= K distinct docs is boilerplate


def q_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 (boilerplate removal): drop every segment whose normalized
    form appears in >= _BP_K distinct documents, keep everything else
    in original order. Emits (doc_id, clean_text, n_kept). NULL text
    stays NULL (n_kept 0); a document whose every segment is
    boilerplate survives as an empty string — the downstream filter
    decides its fate, this operator never silently drops documents."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(F.col("text"), " ")
    nseg = F.ceil(F.size(words) / F.lit(_BP_W)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), nseg - F.lit(1)),
        lambda i: F.concat_ws(
            " ", F.slice(words, i * F.lit(_BP_W) + F.lit(1), _BP_W)
        ),
    )
    seg_rows = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.posexplode(segs).alias("seg_idx", "seg")
    )
    counts = seg_rows.groupBy("seg").agg(
        F.countDistinct("doc_id").alias("df")
    )
    kept = seg_rows.join(
        counts.filter(F.col("df") >= _BP_K).select("seg"), "seg", "left_anti"
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda s: s["seg"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return docs.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("text").isNull(), F.lit(None).cast("string"))
        .otherwise(F.coalesce("clean_text", F.lit("")))
        .alias("clean_text"),
        F.when(F.col("text").isNull(), F.lit(0))
        .otherwise(F.coalesce("n_kept", F.lit(0)))
        .alias("n_kept"),
    )


QUERIES = {
    "c04_boilerplate_removal": q_boilerplate_removal,
}

ORACLE = {
    "c04_boilerplate_removal": f"""
        WITH base AS (
            SELECT doc_id, string_split(text, ' ') AS words
            FROM documents WHERE text IS NOT NULL
        ),
        seglist AS (
            SELECT doc_id,
                   [array_to_string(words[(k-1)*{_BP_W}+1 : k*{_BP_W}], ' ')
                    FOR k IN range(1,
                        CAST(ceil(len(words) / {float(_BP_W)!r}) AS INT) + 1)]
                       AS segs
            FROM base
        ),
        segs AS (
            SELECT doc_id,
                   unnest(segs) AS seg,
                   generate_subscripts(segs, 1) AS seg_idx
            FROM seglist
        ),
        counts AS (
            SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY seg
        ),
        kept AS (
            SELECT s.doc_id, s.seg_idx, s.seg
            FROM segs s JOIN counts c USING (seg)
            WHERE c.df < {_BP_K}
        ),
        agg AS (
            SELECT doc_id,
                   string_agg(seg, ' ' ORDER BY seg_idx) AS clean_text,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id
        )
        SELECT d.doc_id,
               CASE WHEN d.text IS NULL THEN NULL
                    ELSE coalesce(a.clean_text, '') END AS clean_text,
               CASE WHEN d.text IS NULL THEN 0
                    ELSE coalesce(a.n_kept, 0) END AS n_kept
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
}
