"""Term statistics — TF-IDF keyword extraction, all Catalyst + one
window, with an exact SQL mirror for the oracle.

Tokenization is the module's single shared rule (lowercase, split on
whitespace, drop empties — the same whitespace semantics as
``dedup.tokens_col``): TF-IDF scores are only comparable when every
consumer tokenizes identically, so both the Spark expression and the
generated DuckDB oracle derive from it.

Formula: tf = raw term count in the document; idf = ln(N / df) with N =
corpus size and df = number of documents containing the term (no
smoothing — df ≥ 1 by construction for any term that appears, and
documents are the universe, so the classic formula is total). score =
round(tf · idf, 6); ties broken by term asc so top-k is deterministic.

Scale notes: one shuffle for the (doc, term) counts (map-side combine
collapses duplicates), one broadcastable df table join (|vocab| rows),
one window partitioned by doc for the top-k. No Python workers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def term_rows(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(id, term) — lowercased whitespace tokens, one row per
    occurrence (duplicates preserved: they are the tf signal)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (df.select(F.col(id_col).alias("id"),
                      F.explode(toks).alias("term"))
            .filter(F.col("term") != ""))


def tfidf_topk(df: DataFrame, k: int = 5, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(id, term, tf, score, rank) — top-``k`` terms per document by
    TF-IDF, rank 1 = best; deterministic (score desc, term asc)."""
    terms = term_rows(df, id_col, text_col)
    n_docs = df.count()
    tf = terms.groupBy("id", "term").agg(F.count("*").alias("tf"))
    # df from tf, whose (id, term) rows are already distinct — deriving
    # it from the exploded term table again would tokenize and shuffle
    # the corpus (the largest intermediate) a second time
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("term"))
    scored = (tf.join(F.broadcast(dfreq), "term")
              .withColumn("score",
                          F.round(F.col("tf")
                                  * F.log(F.lit(float(n_docs))
                                          / F.col("df")), 6)))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("id", "term", "tf", "score", "rank"))


def tfidf_topk_sql(k: int = 5, table: str = "documents",
                   id_col: str = "doc_id",
                   text_col: str = "text") -> str:
    """DuckDB mirror of ``tfidf_topk`` — same tokenization rule, same
    formula, same tie-break."""
    return f"""
WITH _terms AS (
  SELECT {id_col} AS id, t.term
  FROM (SELECT {id_col},
               regexp_extract_all(trim(lower({text_col})), '\\S+') AS ts
        FROM {table}),
       LATERAL unnest(ts) AS t(term)
  WHERE t.term != ''),
_n AS (SELECT count(*) AS n FROM {table}),
_tf AS (SELECT id, term, count(*) AS tf FROM _terms GROUP BY id, term),
_df AS (SELECT term, count(*) AS df FROM _tf GROUP BY term),
_scored AS (
  SELECT tf.id, tf.term, tf.tf,
         round(tf.tf * ln(CAST(_n.n AS DOUBLE) / _df.df), 6) AS score
  FROM _tf tf JOIN _df USING (term), _n),
_ranked AS (
  SELECT *, row_number() OVER (PARTITION BY id
                               ORDER BY score DESC, term ASC) AS rank
  FROM _scored)
SELECT id, term, CAST(tf AS BIGINT) AS tf, score,
       CAST(rank AS INT) AS rank
FROM _ranked WHERE rank <= {k}
"""
