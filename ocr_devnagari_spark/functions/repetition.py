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

Scale notes: a per-document statistic never needs to leave its row.
N-grams are built JVM-side in the array domain (``transform`` +
``slice`` over the split words), sorted in-row, and reduced by ONE
``F.aggregate`` pass over run-lengths — no explode, no shuffle, no
join; the whole signal frame is a single whole-stage-codegen
projection, embarrassingly parallel at any corpus size.  Cost is
O(L log L) per document in the array sort.

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


def _run_stats(sorted_grams: Column, with_gram: bool = True) -> Column:
    """struct(top, dup[, topg]) from a SORTED gram array via one
    ``F.aggregate`` pass over run-lengths — per-document repetition is
    a per-ROW statistic, so it never needs to leave the row: no
    explode, no shuffle.

    ``top`` = max over runs of run·len(gram) (ties: the ``>=`` update
    on the ascending-sorted array keeps the lexicographically GREATEST
    gram, the documented tie rule); ``dup`` = Σ (run−1)·len(gram) over
    runs ≥ 2.  ``with_gram=False`` drops the tie-broken gram STRING
    from the accumulator — the signal frame only needs the fractions,
    and a narrower accumulator is measurably cheaper on the
    higher-order-function evaluation path.  The "" sentinel is safe:
    an n≥2 gram always contains the join space, and for n=1 an empty
    first gram simply extends the zero-length initial run (counted
    correctly from run=0).
    """
    zero = F.lit(0).cast("long")
    fields = [F.lit("").alias("prev"), zero.alias("run"),
              zero.alias("top"), zero.alias("dup")]
    if with_gram:
        fields.append(F.lit("").alias("topg"))
    init = F.struct(*fields)

    def _closed(acc):
        # stats of the run that just ended (acc.prev × acc.run)
        mass = acc["run"] * F.length(acc["prev"])
        better = (acc["run"] > 0) & (mass >= acc["top"])
        out = {"top": F.when(better, mass).otherwise(acc["top"]),
               "dup": F.when(acc["run"] >= 2,
                             acc["dup"] + (acc["run"] - 1)
                             * F.length(acc["prev"]))
               .otherwise(acc["dup"])}
        if with_gram:
            out["topg"] = (F.when(better, acc["prev"])
                           .otherwise(acc["topg"]))
        return out

    def step(acc, g):
        same = acc["prev"] == g
        c = _closed(acc)
        fields = [
            g.alias("prev"),
            F.when(same, acc["run"] + F.lit(1).cast("long"))
            .otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(same, acc["top"]).otherwise(c["top"]).alias("top"),
            F.when(same, acc["dup"]).otherwise(c["dup"]).alias("dup")]
        if with_gram:
            fields.append(F.when(same, acc["topg"]).otherwise(c["topg"])
                          .alias("topg"))
        return F.struct(*fields)

    def finish(acc):
        c = _closed(acc)
        fields = [c["top"].alias("top"), c["dup"].alias("dup")]
        if with_gram:
            fields.append(c["topg"].alias("topg"))
        return F.struct(*fields)

    return F.aggregate(sorted_grams, init, step, finish)


def ngram_stats(df: DataFrame, n: int, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per-document n-gram repetition stats.

    Returns ``(id_col, top_gram, top_frac, dup_frac)`` with the
    definitions in the module docstring, fractions rounded to 6 d.p.
    Documents with fewer than ``n`` words yield no row (callers
    left-join and treat NULL as "cannot repeat").
    """
    grams = word_ngrams(F.col(text_col), n)
    st = _run_stats(F.array_sort(grams))
    frac = lambda c: F.round(  # noqa: E731
        F.least(F.lit(1.0), c.cast("double") / F.col("_total")), 6)
    return (df.select(F.col(id_col),
                      F.length(F.col(text_col)).alias("_total"),
                      F.size(grams).alias("_ng"),
                      st.alias("_st"))
            .filter(F.col("_ng") > 0)
            .select(F.col(id_col),
                    F.col("_st.topg").alias("top_gram"),
                    frac(F.col("_st.top")).alias("top_frac"),
                    frac(F.col("_st.dup")).alias("dup_frac")))


def repetition_signals(df: DataFrame, top_ns: tuple = (2, 3),
                       dup_ns: tuple = (5,), id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Per-document signal frame: one ``top{n}_frac`` column per entry
    of ``top_ns`` and one ``dup{n}_frac`` per ``dup_ns``.

    SHUFFLE-FREE: per-document repetition is a per-row statistic, so
    every n's signals are just more projected columns over the same
    scan (``_run_stats`` over the sorted gram array — no explode, no
    aggregation exchange, no join; the whole frame is one
    whole-stage-codegen projection).  Documents shorter than a given n
    carry NULL for that n's signals — callers treat NULL as "cannot
    repeat", i.e. pass.
    """
    ns = sorted(set(top_ns) | set(dup_ns))
    total = F.length(F.col(text_col))
    frac = lambda c: F.round(  # noqa: E731
        F.least(F.lit(1.0), c.cast("double") / total), 6)
    cols = [F.col(id_col)]
    for n in ns:
        grams = word_ngrams(F.col(text_col), n)
        st = _run_stats(F.array_sort(grams), with_gram=False)
        present = F.size(grams) > 0
        if n in top_ns:
            cols.append(F.when(present, frac(st["top"]))
                        .alias(f"top{n}_frac"))
        if n in dup_ns:
            cols.append(F.when(present, frac(st["dup"]))
                        .alias(f"dup{n}_frac"))
    return df.select(*cols)


def repetition_pass_expr(text: Column, max_top2: float = 0.20,
                         max_top3: float = 0.18,
                         max_dup5: float = 0.15) -> Column:
    """Boolean Gopher repetition gate as ONE Column expression — lets
    compositions (plans/curation.py) filter inline with zero joins.
    NULL signals (doc shorter than n) count as passing."""

    def sig(n, field):
        grams = word_ngrams(text, n)
        val = _run_stats(F.array_sort(grams),
                         with_gram=False)[field].cast("double") \
            / F.length(text)
        return F.coalesce(
            F.when(F.size(grams) > 0,
                   F.round(F.least(F.lit(1.0), val), 6)),
            F.lit(0.0))

    return ((sig(2, "top") <= max_top2)
            & (sig(3, "top") <= max_top3)
            & (sig(5, "dup") <= max_dup5))


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
