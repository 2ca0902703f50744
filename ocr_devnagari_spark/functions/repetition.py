"""Within-document repetition signals — the Gopher A1.1 filter family.

Training-data pipelines drop documents whose text is dominated by
repeated fragments (navigation bars, keyword stuffing, generated spam).
The public recipe (Rae et al. 2021 "Scaling Language Models", Appendix
A1.1; re-implemented by Dolma/RedPajama) measures, per document:

- ``top_ngram_char_fraction(n)`` — the fraction of characters covered
  by occurrences of the single most frequent word n-gram (n = 2..4).
- ``dup_ngram_char_fraction(n)`` — the fraction of characters covered
  by *duplicated* word n-grams (n = 5..10).

Exact char-coverage without double counting needs interval arithmetic;
like the public reimplementations we use a deterministic approximation,
stated precisely so the DuckDB oracle can mirror it bit-for-bit:

- a gram's characters = ``length(gram)`` (words + single-space joins);
  the denominator is ``length(text)``.
- top fraction  = ``max(cnt * length(gram)) / length(text)``, capped 1.
- dup fraction  = ``sum((cnt - 1) * length(gram)) / length(text)`` over
  grams with cnt ≥ 2, capped at 1 (the first occurrence is "legitimate",
  repeats are the duplicated mass — overlapping repeats count multiply).
- ``top_gram`` tie-break: highest char mass, then lexicographically
  greatest gram (struct max), part of the spec.

Scale notes: n-grams are built JVM-side in the array domain
(``transform`` + ``slice`` over the split words — no window, no
per-document partition pinning), then exploded into ONE
``groupBy(id, gram)`` with map-side partial aggregation and a second
tiny ``groupBy(id)``.  Keys are (doc, gram) pairs so a hot gram does
not create a hot partition; per-doc output is one row.  This is the
plan shape that survives 100 TB — nothing is collected, and the only
state is the aggregation hash maps.

No counterpart in the reference (an OCR orchestrator); this family is
part of the engine's web-corpus surface alongside functions/text.py's
quality/Gopher gates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_ngrams(col: Column, n: int) -> Column:
    """array<string> of space-joined word ``n``-grams of ``col``.

    Built entirely in the array domain: split once, then
    ``transform(sequence(...), i -> concat_ws(' ', slice(words, i, n)))``.
    Documents with fewer than ``n`` words yield an empty array.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    words = F.split(col, " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>"))


def ngram_stats(df: DataFrame, n: int, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per-document n-gram repetition stats.

    Returns ``(id_col, top_gram, top_frac, dup_frac)`` with the
    definitions in the module docstring, fractions rounded to 6 d.p.
    """
    base = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("_total"),
        word_ngrams(F.col(text_col), n).alias("_grams"),
    )
    counts = (base
              .select(id_col, "_total", F.explode("_grams").alias("gram"))
              .groupBy(id_col, "_total", "gram")
              .agg(F.count(F.lit(1)).alias("cnt")))
    mass = (F.col("cnt") * F.length("gram")).cast("long")
    per_doc = (counts
               .groupBy(id_col, "_total")
               .agg(
                   F.max(F.struct(mass.alias("chars"),
                                  F.col("gram"))).alias("_top"),
                   F.sum(F.when(F.col("cnt") >= 2,
                                (F.col("cnt") - 1) * F.length("gram"))
                         .otherwise(F.lit(0))).alias("_dup")))
    frac = lambda c: F.round(  # noqa: E731
        F.least(F.lit(1.0), c.cast("double") / F.col("_total")), 6)
    return per_doc.select(
        F.col(id_col),
        F.col("_top.gram").alias("top_gram"),
        frac(F.col("_top.chars")).alias("top_frac"),
        frac(F.col("_dup")).alias("dup_frac"),
    )


def repetition_signals(df: DataFrame, top_ns: tuple = (2, 3),
                       dup_ns: tuple = (5,), id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Per-document signal frame: one ``top{n}_frac`` column per entry
    of ``top_ns`` and one ``dup{n}_frac`` per ``dup_ns``.

    FUSED plan: every requested n contributes (n, gram) structs to ONE
    array that explodes once, so the corpus is scanned once and the
    gram traffic shuffles through a single ``groupBy(id, n, gram)`` →
    ``groupBy(id, n)`` → pivot cascade (vs one full cascade per n).
    Documents shorter than every requested n still appear (left join
    from the id spine) with NULL signals — callers treat NULL as
    "cannot repeat", i.e. pass.
    """
    ns = sorted(set(top_ns) | set(dup_ns))

    def _tag(n):
        # a ONE-argument lambda is mandatory: F.transform treats a
        # second parameter as the element-index slot, which would
        # silently shadow the captured n
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    tagged = F.concat(*[
        F.transform(word_ngrams(F.col(text_col), n), _tag(n))
        for n in ns])
    base = df.select(F.col(id_col),
                     F.length(F.col(text_col)).alias("_total"),
                     F.explode(tagged).alias("t"))
    counts = (base
              .groupBy(id_col, "_total", F.col("t.n").alias("n"),
                       F.col("t.gram").alias("gram"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    frac = lambda c: F.round(  # noqa: E731
        F.least(F.lit(1.0), c.cast("double") / F.col("_total")), 6)
    per = (counts
           .groupBy(id_col, "_total", "n")
           .agg(F.max((F.col("cnt") * F.length("gram")).cast("long"))
                .alias("_top"),
                F.sum(F.when(F.col("cnt") >= 2,
                             (F.col("cnt") - 1) * F.length("gram"))
                      .otherwise(F.lit(0))).alias("_dup"))
           .select(id_col, "n", frac(F.col("_top")).alias("top_frac"),
                   frac(F.col("_dup")).alias("dup_frac")))
    pivoted = (per.groupBy(id_col).pivot("n", ns)
               .agg(F.first("top_frac").alias("top"),
                    F.first("dup_frac").alias("dup")))
    cols = [F.col(id_col)]
    for n in ns:
        # a two-agg pivot names columns "{value}_{agg alias}"
        if n in top_ns:
            cols.append(F.col(f"`{n}_top`").alias(f"top{n}_frac"))
        if n in dup_ns:
            cols.append(F.col(f"`{n}_dup`").alias(f"dup{n}_frac"))
    out = df.select(id_col).join(pivoted.select(*cols), on=id_col,
                                 how="left")
    return out


def gopher_repetition_pass(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           max_top2: float = 0.20,
                           max_top3: float = 0.18,
                           max_dup5: float = 0.15) -> DataFrame:
    """Gopher-style repetition gate: keep documents below every
    threshold (Rae et al. 2021 use 0.20/0.18/.../0.15 for the
    corresponding signals).  Returns ``(id_col, top2_frac, top3_frac,
    dup5_frac, rep_pass)``."""
    sig = repetition_signals(df, top_ns=(2, 3), dup_ns=(5,),
                             id_col=id_col, text_col=text_col)
    keep = ((F.coalesce(F.col("top2_frac"), F.lit(0.0)) <= max_top2)
            & (F.coalesce(F.col("top3_frac"), F.lit(0.0)) <= max_top3)
            & (F.coalesce(F.col("dup5_frac"), F.lit(0.0)) <= max_dup5))
    return sig.select(id_col, "top2_frac", "top3_frac", "dup5_frac",
                      keep.alias("rep_pass"))
