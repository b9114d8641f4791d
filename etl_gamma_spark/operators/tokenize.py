"""Distributed BPE (byte-pair encoding) vocabulary training — the
tokenizer-construction step of an LLM data pipeline (Sennrich et al.
2016), expressed Spark-first:

  * the corpus collapses to a WORD HISTOGRAM first (one hash aggregate;
    at 100 TB the histogram is orders of magnitude smaller than the
    corpus and is the only thing the merge loop ever touches);
  * each merge round is one explode→groupBy pair count (map-side
    combined, weighted by word frequency) + a deterministic argmax
    (count DESC, then pair text — a total order, so training is
    reproducible on any partitioning) + one projection applying the
    merge to every word's symbol array;
  * the driver holds NO data — the winning pair attaches via a 1-row
    broadcast join and the loop carries only the round counter;
    per-round localCheckpoint truncates the iterative lineage.

The merge application is a sequential left fold over the symbol array
(``aggregate``): append the next symbol, or fuse it into the
accumulator's tail when (tail, next) equals the winning pair. HOF
lambdas are interpreted per element (CLAUDE.md), which is acceptable
here by design: the fold runs over the WORD HISTOGRAM (vocabulary-sized,
not corpus-sized) during offline index/vocab construction, not in any
per-document hot path.

No DuckDB oracle — the training loop is genuinely iterative (the driver
records a rows-only check) — so correctness is pinned the stronger way:
tests/test_round6_ops.py re-trains the same corpus with a pure-Python
reference BPE and asserts the full merge table matches EXACTLY (integer
counts + total-order tiebreaks make the result engine-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..io import spread
from .similarity import bcast_attach

S = T.SPARK

END = "</w>"  # classic end-of-word marker: merges can't cross words


def word_histogram(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, n): corpus word frequencies — the only corpus-sized pass."""
    return (
        spread(docs)
        .selectExpr(f"explode({T.split_ws(f'lower({text_col})', S)}) AS word")
        .filter("word != ''")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """Split each word into single-character symbols + the end marker."""
    return words.selectExpr(
        "word",
        "n",
        # split(word, '') may emit empty fragments at the edges — drop them
        f"concat(filter(split(word, ''), x -> x != ''), array('{END}')) AS syms",
    )


_MERGE_FOLD = """
aggregate(
    syms,
    CAST(array() AS ARRAY<STRING>),
    (acc, x) -> CASE
        WHEN size(acc) > 0
             AND element_at(acc, -1) = __pa AND x = __pb
        THEN concat(slice(acc, 1, size(acc) - 1), array(concat(__pa, __pb)))
        ELSE concat(acc, array(x))
    END
)
"""


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    words: DataFrame | None = None,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus.

    Output: (merge_rank, lhs, rhs, pair_count) — the ordered merge
    table (the artifact a tokenizer ships). merge_rank starts at 1.
    ``words`` lets a caller that also encodes share ONE materialized
    word histogram (the only corpus-sized pass) across both stages.
    """
    if words is None:
        words = word_histogram(docs, text_col)
    syms = _initial_symbols(words).localCheckpoint()
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = (
            syms.selectExpr(
                "n",
                "posexplode(slice(syms, 1, size(syms) - 1)) AS (i, a)",
                "syms",
            )
            .selectExpr("n", "a", "element_at(syms, i + 2) AS b")
            .groupBy("a", "b")
            .agg(F.sum("n").alias("pair_count"))
        )
        # the 1-row argmax rides as the LAZY broadcast build side of the
        # merge-fold checkpoint job (optimization r12): a broadcast
        # exchange materializes its subplan exactly once per job, so the
        # pair aggregate still runs ONCE per round but the separate
        # argmax checkpoint job disappears (one eager job per round
        # instead of two). The degenerate-corpus exit moves to the
        # (cheap, checkpoint-probing) emptiness check on the folded
        # frame: an empty argmax makes the attach join empty, and the
        # pre-assignment ``syms`` binding is untouched on break.
        top = pairs.orderBy(F.desc("pair_count"), "a", "b").limit(1).selectExpr(
            "a AS __pa", "b AS __pb", "pair_count AS __pc"
        )
        folded = (
            bcast_attach(syms, top, "word", "__pa")
            .selectExpr("word", "n", f"{_MERGE_FOLD} AS syms", "__pa", "__pb", "__pc")
            .localCheckpoint()
        )
        if folded.isEmpty():  # degenerate corpus: nothing left to merge
            break
        row = folded.select("__pa", "__pb", "__pc").limit(1)
        merges.append(
            row.selectExpr(
                f"CAST({rank} AS INT) AS merge_rank",
                "__pa AS lhs",
                "__pb AS rhs",
                "CAST(__pc AS BIGINT) AS pair_count",
            )
        )
        syms = folded.select("word", "n", "syms")
    if not merges:
        raise ValueError("corpus produced no mergeable pairs")
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def bpe_segment_words(words: DataFrame, merges: DataFrame) -> DataFrame:
    """Apply a TRAINED merge table to a word histogram — the encode side
    of BPE (what a tokenizer does at corpus-processing time): per word,
    repeatedly fuse the applicable pair with the LOWEST merge rank
    (all leftmost-nonoverlapping occurrences at once, the same greedy
    fold as training) until no adjacent pair is in the table.

    Spark shape: the loop runs over the VOCABULARY (word histogram),
    never the corpus; each round is one pair explode + one broadcast
    hash join against the (tiny) merge table + one reducible
    min(struct(rank)) per word. Words with no applicable pair LEAVE the
    active frame each round (anti-join against the checkpointed next
    frame), so the working set shrinks monotonically; rounds are bounded
    by the merge-table size. Output: (word, n, syms ARRAY<STRING>).
    """
    mt = merges.selectExpr(
        "lhs AS __la", "rhs AS __lb", "CAST(merge_rank AS INT) AS __lr"
    )
    syms = (
        words if "syms" in words.columns else _initial_symbols(words)
    ).localCheckpoint()
    done = []
    while True:
        pairs = (
            syms.selectExpr(
                "word",
                "posexplode(slice(syms, 1, size(syms) - 1)) AS (i, a)",
                "syms",
            )
            .selectExpr("word", "a", "element_at(syms, i + 2) AS b")
        )
        choice = (
            pairs.join(
                F.broadcast(mt),
                (F.col("a") == F.col("__la")) & (F.col("b") == F.col("__lb")),
            )
            .groupBy("word")
            .agg(F.min(F.struct("__lr", "__la", "__lb")).alias("__m"))
            .selectExpr("word", "__m.__la AS __pa", "__m.__lb AS __pb")
        )
        nxt = (
            syms.join(choice, "word")
            .selectExpr("word", "n", f"{_MERGE_FOLD} AS syms")
            .localCheckpoint()
        )
        # finished words: probe the CHECKPOINTED next frame, so the final
        # union never re-runs any round's pair aggregate
        done.append(syms.join(nxt.select("word"), "word", "left_anti"))
        if nxt.isEmpty():
            break
        syms = nxt
    out = done[0]
    for d in done[1:]:
        out = out.unionByName(d)
    return out


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    words: DataFrame | None = None,
) -> DataFrame:
    """Corpus token histogram under a trained BPE vocabulary:
    (token, n_tokens), n_tokens weighted by word frequency. One
    corpus-sized histogram pass (shareable via ``words``); everything
    after runs at vocabulary scale (see bpe_segment_words)."""
    if words is None:
        words = word_histogram(docs, text_col)
    seg = bpe_segment_words(words, merges)
    return (
        seg.selectExpr("n", "explode(syms) AS token")
        .groupBy("token")
        .agg(F.sum("n").cast("bigint").alias("n_tokens"))
    )


def vocab_coverage(
    docs: DataFrame,
    vocab_sizes: tuple[int, ...] = (256, 1024, 4096, 16384),
    text_col: str = "text",
) -> DataFrame:
    """Token-mass coverage curve for vocabulary sizing: what fraction of
    corpus token OCCURRENCES would a top-``K``-by-frequency word
    vocabulary cover, for each literal ``K`` — the first table read when
    choosing a tokenizer vocab size / OOV budget (Zipf in practice:
    coverage climbs fast then flattens; this measures YOUR corpus).

    Computed exactly WITHOUT ranking the vocabulary: unigram counts
    collapse to COUNT CLASSES (one row per distinct frequency value —
    ~O(√corpus) rows under Zipf, bounded regardless of vocabulary size),
    and a running sum over classes in descending-frequency order gives,
    for each K, the full mass of classes that fit entirely plus
    ``(K − types_above) · c`` for the class K lands in. Ties are exact:
    same-count types are interchangeeable for mass coverage, so the
    answer is independent of which tied types make the cut — no
    vocabulary-scale sort, window, or top-K anywhere.

    Output: (vocab_k BIGINT, covered_tokens BIGINT, coverage_permille
    BIGINT) — covered_tokens caps at the full mass when K exceeds the
    distinct-type count.

    Scale posture: one explode → unigram hash agg (map-side combined,
    vocabulary-scale output) → count-class agg (bounded) → ONE
    unpartitioned running-sum window over the bounded class frame →
    a |classes| × |vocab_sizes| conditional aggregate. The corpus is
    touched once; nothing wider than the class frame shuffles after the
    unigram agg.
    """
    from pyspark.sql import Window

    if not vocab_sizes:
        raise ValueError("at least one vocab size required")
    words = spread(docs).selectExpr(f"{T.split_ws(text_col, S)} AS __w")
    uni = (
        words.selectExpr("explode(__w) AS w")
        .groupBy("w")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("c"))
    )
    classes = uni.groupBy("c").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_types")
    )
    w = Window.orderBy(F.col("c").desc())
    cum = classes.select(
        "c",
        "n_types",
        F.sum("n_types").over(w).alias("cum_types"),
    ).selectExpr("c", "n_types", "cum_types", "cum_types - n_types AS prev_types")
    ks = ", ".join(str(k) for k in vocab_sizes)
    expanded = cum.selectExpr(
        "c", "n_types", "cum_types", "prev_types",
        f"explode(array({ks})) AS vocab_k",
    )
    # per (K, class): whole class in the top-K, partial (K straddles the
    # class), or out — exact integer mass either way
    contrib = expanded.selectExpr(
        "vocab_k",
        f"""CASE WHEN cum_types <= vocab_k THEN {T.wint('c', S)} * n_types
             WHEN prev_types < vocab_k
               THEN {T.wint('c', S)} * (vocab_k - prev_types)
             ELSE {T.wint('0', S)} END AS covered""",
    )
    g = contrib.groupBy("vocab_k").agg(
        F.expr("CAST(SUM(covered) AS DECIMAL(38,0))").alias("__cov")
    )
    tot = uni.agg(
        F.expr(f"CAST(SUM({T.wint('c', S)}) AS DECIMAL(38,0))").alias("__tot")
    )
    permille = T.idiv(f"2000 * {T.wint('__cov', S)} + __tot", "2 * __tot", S)
    return bcast_attach(g, tot, "__cov", "__tot").selectExpr(
        "CAST(vocab_k AS BIGINT) AS vocab_k",
        "CAST(__cov AS BIGINT) AS covered_tokens",
        f"CAST({permille} AS BIGINT) AS coverage_permille",
    )
