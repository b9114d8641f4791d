"""Fuzzy entity matching: edit-distance <= 1 pair generation via
deletion-neighborhood banding (the FastSS / SymSpell family, Bocek et
al. 2007).

The naive formulation — self-join on levenshtein(a, b) <= 1 — is a
cartesian product: O(n^2) distance computations and a
BroadcastNestedLoopJoin plan. The banding identity that fixes it:

    lev(a, b) <= 1  <=>  D(a) ∩ D(b) != ∅

where D(s) = {s} ∪ {s with one character deleted}. So each string emits
|s| + 1 variants, candidates come from an EQUI-join on the variant
string, and the exact distance is verified on the candidate pairs only.
Per string the fan-out is O(len); per variant the posting list is small
for natural keys — and ``max_df`` drops degenerate stop-variants (the
same df-cap posture as winnowing/ngram dedup: a variant shared by more
than ``max_df`` strings would go quadratic, and a corpus with that many
1-edit near-equal keys should run exact dedup first — lev-0 duplicates
of a capped variant are intentionally out of contract, mirrored by the
fixture-scale guarantee test).

The pair shuffle carries only (id_a, id_b); names re-attach by two hash
joins afterward (the embedding_neardup narrow-pair pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _variant_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, variant) rows WITH duplicates (equal adjacent characters make
    several deletion positions collapse to one string)."""
    t = F.col("__t")
    return (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
        .select(
            "id",
            "__t",
            F.explode(F.sequence(F.lit(0), F.length("__t"))).alias("__i"),
        )
        .select(
            "id",
            F.when(F.col("__i") == 0, t)
            .otherwise(
                F.concat(
                    t.substr(F.lit(1), F.col("__i") - 1),
                    t.substr(F.col("__i") + 1, F.length(t)),
                )
            )
            .alias("variant"),
        )
    )


def deletion_variants(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Distinct (id, variant) rows: the string itself plus every
    single-character deletion (positions are 1-based; 0 keeps the
    original)."""
    return _variant_rows(df, id_col, text_col).distinct()


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_df: int = 64,
    max_len: int = 256,
) -> DataFrame:
    """All unordered pairs with levenshtein distance <= 1, banded by
    deletion variants. Returns (id_a, id_b, name_a, name_b, lev) with
    id_a < id_b.

    This is a KEY matcher (names, codes, identifiers): the variant
    fan-out is O(len) per string, so document-length text would explode
    the band stage. Strings longer than ``max_len`` are excluded up
    front (they cannot pair with anything) — near-dup detection for long
    text belongs to the shingle/MinHash family in operators/dedup.py.
    """
    df = df.where(F.length(F.col(text_col)) <= max_len)
    # band on the 64-bit hash of the variant, not the variant string:
    # every downstream shuffle (dedup, df-count, self-join) carries 8
    # bytes instead of a near-full-length string, and a hash collision
    # can only create a false CANDIDATE — the exact levenshtein
    # verification below rejects it (measured ~1.5x on the whole op)
    variants = (
        _variant_rows(df, id_col, text_col)
        .select("id", F.xxhash64("variant").alias("vh"))
        .distinct()
    )
    # df-cap: drop stop-variants before the self-join (skew guard)
    df_counts = variants.groupBy("vh").agg(F.count("*").alias("__df"))
    kept = variants.join(
        df_counts.where(F.col("__df") <= max_df).select("vh"), "vh"
    )
    a = kept.select("vh", F.col("id").alias("id_a"))
    b = kept.select("vh", F.col("id").alias("id_b"))
    cands = (
        a.join(b, "vh")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    na = df.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("name_a"))
    nb = df.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("name_b"))
    return (
        cands.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("lev", F.levenshtein("name_a", "name_b").cast("int"))
        .where(F.col("lev") <= 1)
        .select("id_a", "id_b", "name_a", "name_b", "lev")
    )
