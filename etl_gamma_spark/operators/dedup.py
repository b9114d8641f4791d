"""Deduplication operators for training-data pipelines (extension surface;
BASELINE.json north star): exact, MinHash+LSH, SimHash, n-gram Jaccard.

All operators are pure DataFrame plans built from JVM-side higher-order
functions (functions/text.py expression generators — no Python UDFs), so
they scale with Tungsten codegen.

Scale posture per operator:
  * exact_dedup — one hash-aggregate shuffle on a 32-char fingerprint key;
    map-side combine collapses most duplicates before the exchange.
  * minhash signatures — embarrassingly parallel per-row (no shuffle);
    shingling + K permutations happen inside one projection.
  * LSH pairs — shuffle on (band, band_key) only; candidate verification
    joins signatures (small per-doc payload), never the raw text. This is
    the 100 TB path: the quadratic work is confined to same-bucket pairs.
  * ngram_jaccard_pairs — exact O(pairs-sharing-a-shingle); use as the
    verifier behind LSH at scale, or standalone at small scale.
  * simhash — per-row signature; near-dup = Hamming distance on 16 bits.
  * substring family (substring_dup_spans / substring_dedup /
    decontamination_spans / incremental_substring_spans) — exact
    >=k-token span detection via anchored k-gram posting lists + a
    per-(pair, diagonal) run merge; df-capped stop-grams bound every
    gram's pair fan-out, and the window partition is bounded by document
    length, never corpus size.
  * intradoc repeats (intradoc_repeat_spans / strip_intradoc_repeats) —
    the same anchor/diagonal machinery self-joined within a document
    ((doc, gram)-keyed, per-doc occurrence cap); localizes and strips
    within-document repetition the Gopher signals only measure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..io import spread
from .similarity import hamming_expr

S = T.SPARK

def _hot_keys(df, keys: list[str], limit: int):
    """Lazy over-limit key list: ``groupBy(keys).count()`` reduces to one
    row per key map-side, so only combined partials cross the exchange —
    the two-phase half of the skew guard, kept separate so plan tests can
    assert its shape before :func:`cap_hot_keys` materializes it."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__kc"))
        .filter(F.col("__kc") > limit)
        .select(*[F.col(k).alias(f"__hot_{k}") for k in keys])
    )


def cap_hot_keys(df, keys: list[str], limit: int, max_broadcast_keys: int = 4_000_000):
    """Drop rows whose key combination occurs more than ``limit`` times —
    the shared skew guard of every pair generator (band buckets, shingle
    posting lists).

    Two-phase, deliberately NOT a window count: a window ``count(*) OVER
    (PARTITION BY keys)`` must land every row of a key in ONE task before
    it can count (a window partition cannot be split by AQE), so a
    mega-hot key — the empty-document band, a boilerplate shingle — would
    serialize exactly the rows this guard exists to discard. Here only
    map-side-combined partials cross the wire: ``groupBy(keys).count()``
    reduces to one row per key before the exchange, the over-limit key
    list is tiny by construction (each key carries > ``limit`` rows, so
    there are at most rows/limit of them) and broadcasts, and the
    left-anti probe is shuffle-free on the data side. No single task ever
    receives a hot key's rows. Costs one extra small exchange vs the
    window form locally; at scale it is the difference between finishing
    and one straggler task OOMing.

    Join keys use null-safe equality so a NULL key counts as one key, as
    it does under GROUP BY in the oracle HAVING clauses callers keep in
    sync with this cap.

    "Tiny by construction" is only rows/limit — NOT tiny on a
    duplicate-heavy corpus at a small ``limit`` (10^11 rows at limit 64
    admits ~10^9 over-limit keys). The hot list is therefore
    materialized (localCheckpoint — which also makes the count pass run
    ONCE instead of re-executing inside the join) and force-broadcast
    only while it holds at most ``max_broadcast_keys`` entries; beyond
    that the anti-join falls back to a shuffle, which is slower but
    cannot OOM the driver/executors inside the guard that exists to
    keep the job survivable.
    """
    hot = _hot_keys(df, keys, limit).localCheckpoint()
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__hot_{k}"))
        cond = c if cond is None else cond & c
    build = F.broadcast(hot) if hot.count() <= max_broadcast_keys else hot
    return df.join(build, cond, "left_anti")



def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """md5 content fingerprint after whitespace/case normalization."""
    norm = f"lower(regexp_replace(trim({text_col}), ' +', ' '))"
    return docs.selectExpr(id_col, f"md5({norm}) AS fp")


def exact_dedup_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group identical (normalized) texts: (fp, n_docs, keeper=min id)."""
    return (
        fingerprint(docs, text_col, id_col)
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keeper"),
        )
    )


def exact_dedup_keep(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Survivors of exact dedup (smallest id per fingerprint wins)."""
    keepers = exact_dedup_groups(docs, text_col, id_col).select(
        F.col("keeper").alias(id_col)
    )
    return docs.join(keepers, id_col, "left_semi")


def _with_shingles(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, shingles array) — word split materialized first (see
    functions/text.py::word_shingles for why). Input is spread first so
    the shingle projection parallelizes even from a 1-partition local
    read (no-op at scale)."""
    docs = spread(docs)
    return docs.selectExpr(
        id_col, f"{T.split_ws(text_col, S)} AS __w", f"{text_col} AS __t"
    ).selectExpr(id_col, f"{T.word_shingles('__w', '__t', S, n)} AS shingles")


def shingle_sets(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct n-word shingles, exploded."""
    return _with_shingles(docs, text_col, id_col, n).select(
        id_col, F.explode("shingles").alias("shingle")
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, m0..m15): K=16 MinHash values per document.

    Explode + aggregate, not per-row array lambdas: each shingle is
    hashed ONCE in whole-stage codegen, the K permutations are flat
    projections over that hash, and the K mins reduce through one
    map-side-combined hash aggregate — so the shuffle carries at most
    |docs| x K longs per partition regardless of shingle count. The
    integers are identical to the lambda form (min over a bag equals
    min over its distinct support); the DuckDB oracle keeps the
    list_transform spelling and hashes match. Measured 2.6 -> 1.7 s on
    the full LSH-pairs query at sf0.1 (the 16 interpreted transform()
    passes were the dominant term). explode_outer keeps zero-shingle
    docs with a NULL signature, matching array_min over an empty array.

    ``shingles`` — an already-derived :func:`shingle_sets` frame
    (id, shingle) — skips the shingle pipeline so a caller that also
    needs the exploded sets (minhash_jaccard_calibration's exact
    intersections) tokenizes the corpus ONCE (optimization r12, guide
    §2.4). Bit-identical: word_shingles always yields >= 1 shingle
    (short docs shingle to the whole text), so the exploded frame covers
    every document and explode == explode_outer here.
    """
    if shingles is not None:
        ex = shingles.selectExpr(
            id_col, f"{T.hexint('shingle', S)} % {T.MINHASH_P} AS __h"
        )
    else:
        ex = (
            _with_shingles(docs, text_col, id_col, n)
            .selectExpr(id_col, "explode_outer(shingles) AS __s")
            .selectExpr(id_col, f"{T.hexint('__s', S)} % {T.MINHASH_P} AS __h")
        )
    perms = ex.selectExpr(
        id_col,
        *[
            "(({a} * __h + {b}) % {p}) AS __p{j}".format(
                a=T.minhash_params(j)[0],
                b=T.minhash_params(j)[1],
                p=T.MINHASH_P,
                j=j,
            )
            for j in range(T.MINHASH_K)
        ],
    )
    return perms.groupBy(id_col).agg(
        *[F.min(f"__p{j}").alias(f"m{j}") for j in range(T.MINHASH_K)]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_bucket: int = 1024,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH over the MinHash
    signature (4 bands × 4 rows), with the MinHash-estimated Jaccard.

    Returns (doc_a, doc_b, est_jaccard) for pairs sharing ≥1 band bucket.

    Band buckets holding more than ``max_bucket`` documents are dropped
    before candidate generation — the skew guard for duplicate-heavy
    corpora (the corpora dedup exists for): every member of a large
    duplicate cluster shares band keys, so one bucket's self-join output
    is quadratic in cluster size. An over-cap bucket is, by construction,
    a near-identical cluster — route it through :func:`exact_dedup_groups`
    instead of pairwise LSH. Per-bucket join work is thus bounded at
    ``max_bucket²`` regardless of corpus size.
    """
    # localCheckpoint (not cache): materialized once, lineage truncated,
    # and storage is released by the ContextCleaner when the frame goes out
    # of scope — cache() would pin it for the whole session
    sigs = minhash_signatures(
        docs, text_col, id_col, n, shingles=shingles
    ).localCheckpoint()
    m_cols = [f"m{j}" for j in range(T.MINHASH_K)]

    banded = sigs.selectExpr(id_col, *m_cols, *T.band_key_exprs(S))
    bands = None
    for band in range(T.MINHASH_BANDS):
        b = banded.select(
            F.col(id_col), F.lit(band).alias("band"), F.col(f"band{band}").alias("bkey")
        )
        bands = b if bands is None else bands.unionByName(b)

    capped = cap_hot_keys(bands, ["band", "bkey"], max_bucket)
    left = capped.select(F.col(id_col).alias("doc_a"), "band", "bkey")
    right = capped.select(F.col(id_col).alias("doc_b"), "band", "bkey")
    cand = (
        left.join(right, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    sa = sigs.select(F.col(id_col).alias("doc_a"), *[F.col(c).alias(f"a_{c}") for c in m_cols])
    sb = sigs.select(F.col(id_col).alias("doc_b"), *[F.col(c).alias(f"b_{c}") for c in m_cols])
    matches = " + ".join(
        f"CASE WHEN a_{c} = b_{c} THEN 1 ELSE 0 END" for c in m_cols
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .selectExpr(
            "doc_a",
            "doc_b",
            f"CAST(({matches}) AS DOUBLE) / {T.MINHASH_K}.0 AS est_jaccard",
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    max_df: int = 50,
) -> DataFrame:
    """n-gram Jaccard similarity pairs via a shingle inverted index:
    |A∩B| from a self-join on shingle, |A∪B| = |A|+|B|-|A∩B|.

    Shingles appearing in more than ``max_df`` documents are dropped from
    the inverted index first (same stop-gram practice as
    :func:`winnow_overlap_pairs`): a boilerplate shingle present in ~every
    document makes that one join key's output quadratic in corpus size —
    the classic skewed-key scale killer. Set sizes (|A|, |B|) still count
    ALL shingles, so the reported jaccard is exact when no shingle of the
    pair was capped and a strict lower bound otherwise (conservative for
    dedup: capped boilerplate never manufactures similarity)."""
    sh = shingle_sets(docs, text_col, id_col, n).localCheckpoint()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))

    shr = cap_hot_keys(sh, ["shingle"], max_df)
    a = shr.select(F.col(id_col).alias("doc_a"), "shingle")
    b = shr.select(F.col(id_col).alias("doc_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    # sizes is a per-DOC table (O(N) rows) — shuffle hash join, never
    # broadcast: at corpus scale broadcasting it OOMs driver + executors
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(na, "doc_a")
        .join(nb, "doc_b")
        .selectExpr(
            "doc_a",
            "doc_b",
            "CAST(n_shared AS DOUBLE) / CAST(n_a + n_b - n_shared AS DOUBLE) AS jaccard",
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )


def ngram_containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int = 50,
) -> DataFrame:
    """Directed n-gram CONTAINMENT pairs — the asymmetric sibling of
    :func:`ngram_jaccard_pairs` (Broder's resemblance-vs-containment
    distinction): containment(A→B) = |A∩B| / |A|. Catches a short
    document quoted or embedded inside a much longer one, where Jaccard
    is diluted by the container's size (|A∩B|/|A∪B| → 0 as |B| grows)
    and symmetric near-dup never fires — the excerpt-spam / quote-farm
    case a dedup pass built only on Jaccard ships straight through.

    Output: (doc_contained, doc_container, n_shared, containment), one
    DIRECTED row per direction clearing ``threshold`` (a true mutual
    near-dup emits both directions).

    Scale posture: identical to the Jaccard pairs — one df-capped
    shingle inverted index, ONE shared-count aggregate feeding BOTH
    directions (no second self-join), per-doc size tables joined by
    shuffle hash join (never broadcast). Set sizes count ALL shingles
    while the index drops capped boilerplate, so reported containment is
    exact when uncapped and a strict lower bound otherwise — capped
    grams can only under-report, never manufacture containment."""
    sh = shingle_sets(docs, text_col, id_col, n).localCheckpoint()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    shr = cap_hot_keys(sh, ["shingle"], max_df)
    a = shr.select(F.col(id_col).alias("doc_a"), "shingle")
    b = shr.select(F.col(id_col).alias("doc_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    base = shared.join(na, "doc_a").join(nb, "doc_b")
    d1 = base.selectExpr(
        "doc_a AS doc_contained",
        "doc_b AS doc_container",
        "CAST(n_shared AS BIGINT) AS n_shared",
        "CAST(n_shared AS DOUBLE) / CAST(n_a AS DOUBLE) AS containment",
    )
    d2 = base.selectExpr(
        "doc_b AS doc_contained",
        "doc_a AS doc_container",
        "CAST(n_shared AS BIGINT) AS n_shared",
        "CAST(n_shared AS DOUBLE) / CAST(n_b AS DOUBLE) AS containment",
    )
    return d1.unionByName(d2).filter(F.col("containment") >= F.lit(threshold))


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = T.WINNOW_K,
    w: int = T.WINNOW_W,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-char gram, keep the min
    hash of each w-length window; the selected DISTINCT hashes are the
    document's fingerprint. Guarantees every shared substring of length
    >= k + w - 1 contributes at least one shared fingerprint.

    Output rows: (doc_id, fp BIGINT). Pure per-row projection + one
    distinct shuffle — scales linearly."""
    return (
        spread(docs)
        .selectExpr(id_col, f"{T.winnow_gram_hashes(text_col, S, k)} AS __g")
        .selectExpr(id_col, f"{T.winnow_select('__g', S, w)} AS __mins")
        .select(id_col, F.explode("__mins").alias("fp"))
        .distinct()
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 25,
    min_shared: int = 5,
    k: int = T.WINNOW_K,
    w: int = T.WINNOW_W,
) -> DataFrame:
    """Near-duplicate / plagiarism candidates from shared winnowing
    fingerprints: pairs sharing >= ``min_shared`` fingerprints, via the
    fp inverted index. Fingerprints appearing in more than ``max_df``
    documents are dropped first (boilerplate stop-grams) — the standard
    MOSS practice, and the scale guard: without it an ubiquitous gram
    joins all-pairs. Remaining join fan-out is bounded by
    sum(df^2) over rare fps only."""
    fps = winnow_fingerprints(docs, text_col, id_col, k, w).localCheckpoint()
    rare_fp = fps.groupBy("fp").count().filter(F.col("count") <= max_df).select("fp")
    # per-FP frame — plain shuffle join on fp, never broadcast (O(corpus))
    rare = fps.join(rare_fp, "fp")
    a = rare.select(F.col(id_col).alias("doc_a"), "fp")
    b = rare.select(F.col(id_col).alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def simhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """(doc_id, simhash): 16-bit SimHash over the word multiset — per-token
    md5-derived bits, summed ±1 per position, sign-packed."""
    tokens = spread(docs).selectExpr(
        id_col, f"explode({T.split_ws(f'lower({text_col})', S)}) AS tok"
    ).selectExpr(id_col, f"{T.hexint('tok', S)} AS h")
    sums = tokens.groupBy(id_col).agg(
        *[
            F.expr(f"SUM(CASE WHEN {T.bit('h', i, S)} = 1 THEN 1 ELSE -1 END)").alias(f"s{i}")
            for i in range(bits)
        ]
    )
    packed = " + ".join(f"CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(bits))
    return sums.selectExpr(id_col, f"CAST({packed} AS BIGINT) AS simhash")


def neardup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 30,
    stats: dict | None = None,
    assume_distinct_pairs: bool = False,
) -> DataFrame:
    """Connected components over near-duplicate pairs: every document gets
    a ``cluster_id`` = the minimum doc id reachable through the pair graph
    (iterative min-label propagation — the standard distributed CC
    algorithm; converges in O(graph diameter) rounds).

    Output: (doc_id, cluster_id); singleton docs are their own cluster.
    ``keep = cluster_id == doc_id`` selects one representative per cluster.

    Driver-side loop contains NO data (only a convergence counter);
    per-round localCheckpoint() truncates lineage so plans stay bounded.

    The iteration runs over EDGE-ENDPOINT nodes only, never the corpus:
    a node with no near-dup edge can never change its label, so looping
    over full ``docs`` would shuffle the whole corpus once per round for
    rows that are fixed points by construction (at 100 TB the edge
    subgraph is the dedup mass — orders of magnitude smaller than the
    corpus). Untouched documents get their singleton label in one final
    left join after convergence.

    ``stats`` (optional dict) receives ``{"rounds": k}`` — the number of
    label-propagation rounds the loop ran before converging (round 1 is
    folded into the label init and counted; per-round localCheckpoints
    number rounds-1); the scale probes report it so a 100×-duplicate
    corpus shows whether giant clusters deepen the iteration or only
    widen the rounds (tools/scale_probe.py).

    ``assume_distinct_pairs``: min-label propagation is duplicate-SAFE
    (every step is a min over a bag — duplicated edges change no label),
    so the edge distinct() is purely the performance guard that stops a
    duplicate-heavy pair list being re-joined every round. Callers whose
    pairs are distinct by construction (minhash_lsh_pairs output: the
    candidate set IS a distinct() on (doc_a, doc_b) with doc_a < doc_b,
    and the two union directions cannot collide because one side has
    id < nbr and the other id > nbr) pass True and skip a full
    edge-mass exchange + aggregate in the edges materialization
    (optimization r13, guide §2.4: "a distinct on data that is already
    unique").
    """
    edges = pairs.selectExpr(
        f"doc_a AS {id_col}", "doc_b AS nbr"
    ).unionByName(pairs.selectExpr(f"doc_b AS {id_col}", "doc_a AS nbr"))
    if not assume_distinct_pairs:
        edges = edges.distinct()
    edges = edges.localCheckpoint()
    # Round 1 folded into the label init (optimization r12, guide §2.4):
    # with init label == own id, the first propagation round computes
    # exactly least(id, min(nbr)) — an aggregate over the edge list. The
    # groupBy replaces the endpoint-set distinct (both edge directions
    # are present, so the id_col group keys ARE the endpoint set) at the
    # SAME exchange count, so the first full join round (edges⋈labels +
    # groupBy + left join + checkpoint + convergence count) disappears
    # outright. Round 1 always changes some label whenever an edge
    # exists (every edge has a higher endpoint), so skipping its change
    # check never misses convergence; an empty edge set converges in the
    # first loop round exactly as before.
    labels = edges.groupBy(id_col).agg(F.min("nbr").alias("__mn")).select(
        F.col(id_col),
        F.least(F.col(id_col), F.col("__mn")).alias("cluster_id"),
    )
    converged = False
    rounds = 1
    for _ in range(max_iters - 1):
        rounds += 1
        nbr_min = (
            edges.join(labels, id_col)
            .groupBy("nbr")
            .agg(F.min("cluster_id").alias("nbr_label"))
            .withColumnRenamed("nbr", id_col)
        )
        # carry the OLD label through the checkpoint so the convergence
        # probe is a filter over the materialized frame, not another
        # corpus-wide join per round
        stepped = (
            labels.join(nbr_min, id_col, "left")
            .select(
                F.col(id_col),
                F.col("cluster_id").alias("__old"),
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_label", "cluster_id")
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            stepped.filter(F.col("cluster_id") != F.col("__old")).limit(1).count()
        )
        labels = stepped.select(id_col, "cluster_id")
        if changed == 0:
            converged = True
            break
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        # unconverged labels are silently WRONG (a component wider than
        # max_iters hops would split) — refuse rather than mislabel
        raise RuntimeError(
            f"neardup_clusters did not converge within {max_iters} rounds; "
            "raise max_iters (graph diameter exceeds the cap)"
        )
    # corpus rows outside the edge subgraph are singleton fixed points —
    # one label attach, the only corpus-wide operation in this function
    return docs.select(id_col).join(labels, id_col, "left").select(
        F.col(id_col),
        F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
    )


def cluster_size_histogram(
    clusters: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Dedup observability report over :func:`neardup_clusters` output:
    the cluster-size spectrum — for each size, how many clusters, how
    many documents they hold, and the redundant mass (docs minus one
    keeper per cluster). This is the number a pipeline operator reads
    BEFORE committing a dedup threshold at 100 TB: the redundant-mass
    total is exactly what :func:`cluster_prune` will remove, and a fat
    tail of giant clusters is the boilerplate / skew warning.

    Output: (n_members, n_clusters, n_docs, n_redundant), one row per
    distinct cluster size. Two reducible hash aggregates, no windows —
    a corpus-wide giant cluster pre-combines map-side like any other
    group."""
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    return sizes.groupBy("n_members").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum("n_members").cast("bigint").alias("n_docs"),
        (F.sum("n_members") - F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_redundant"),
    )


def cluster_aware_split(
    clusters: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Leakage-proof train/val/test assignment: the split is a pure
    function of the near-dup CLUSTER id (md5 bucket, dataset_split's
    convention), so an entire duplicate cluster always lands in ONE
    split — the PREVENTION twin of ``split_leakage_pairs`` (which only
    detects leakage after the fact). Hashing the document id instead
    (``dataset_split``) sends two near-copies to different splits with
    probability ~2·p·(1−p) per pair; on a duplicate-heavy web corpus
    that is guaranteed eval contamination, which near-dup-aware
    pipelines split by cluster to avoid (the dedup-before-split
    practice). Input is :func:`neardup_clusters` output; singleton docs
    hash on their own id (== their cluster_id), so the marginal split
    fractions match dataset_split's on the deduplicated mass.

    Output: (doc_id, cluster_id, split) — one labeled row per document.
    Pure narrow projection over the cluster table; no extra shuffle."""
    bucket = f"{T.hexint('CAST(cluster_id AS STRING)', T.SPARK)} % 100"
    return clusters.selectExpr(
        id_col,
        "cluster_id",
        f"""CASE WHEN {bucket} < {train_pct} THEN 'train'
             WHEN {bucket} < {train_pct + val_pct} THEN 'val'
             ELSE 'test' END AS split""",
    )


def stratified_sample(
    docs: DataFrame,
    stratum_col: str = "lang",
    keep_pct: dict[str, int] | None = None,
    default_pct: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff
    md5-hash(text) % 100 < pct(stratum). No RNG — the same corpus always
    samples identically (reproducible training mixes), and the predicate
    is a pure column expression (prunable, pushable)."""
    pct = F.lit(default_pct)
    for stratum, p in (keep_pct or {}).items():
        pct = F.when(F.col(stratum_col) == stratum, p).otherwise(pct)
    bucket = F.expr(f"{T.hexint(text_col, T.SPARK)} % 100")
    return docs.withColumn("__pct", pct).filter(bucket < F.col("__pct")).drop("__pct")


def simhash_neardup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    n_bands: int = 4,
    max_bucket: int = 1024,
) -> DataFrame:
    """Near-duplicate pairs by SimHash: candidates generated by banding the
    signature into ``n_bands`` slices (pigeonhole: any pair within Hamming
    distance < n_bands shares at least one intact band), then verified with
    an exact Hamming distance — never an all-pairs scan.

    32-bit default: with 16-bit signatures each band key has only 4 bits
    (16 values), so every band bucket holds ~N/16 docs and the candidate
    join degenerates toward all-pairs; 8-bit band keys keep buckets sparse.

    Band buckets above ``max_bucket`` documents are dropped before the
    candidate self-join (skew guard — a degenerate value such as empty /
    boilerplate text puts a whole duplicate cluster in one bucket and
    makes its join output quadratic). Over-cap clusters belong to
    :func:`exact_dedup_groups`. For corpus-scale runs the primary knob is
    band WIDTH (wider signatures → more distinct band keys → sparser
    buckets); the cap bounds what width cannot: true duplicate mass.
    """
    if max_hamming >= n_bands:
        raise ValueError(
            f"banding with {n_bands} bands only guarantees recall for "
            f"Hamming distance < {n_bands}; got max_hamming={max_hamming} "
            "(raise n_bands)"
        )
    # materialize once: the band union + pair join reference this frame up
    # to 2·n_bands times and would re-run the signature aggregation each time
    sigs = simhash_signatures(docs, text_col, id_col, bits).localCheckpoint()
    band_bits = bits // n_bands
    bands = None
    for b in range(n_bands):
        part = sigs.selectExpr(
            id_col,
            "simhash",
            f"{b} AS band",
            f"(CAST(simhash AS BIGINT) >> {b * band_bits}) & {(1 << band_bits) - 1} AS bkey",
        )
        bands = part if bands is None else bands.unionByName(part)
    capped = cap_hot_keys(bands, ["band", "bkey"], max_bucket)
    left = capped.selectExpr(f"{id_col} AS doc_a", "simhash AS sim_a", "band", "bkey")
    right = capped.selectExpr(f"{id_col} AS doc_b", "simhash AS sim_b", "band", "bkey")
    return (
        left.join(right, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
        .selectExpr("doc_a", "doc_b", f"{hamming_expr('sim_a', 'sim_b')} AS hamming")
        .filter(F.col("hamming") <= max_hamming)
    )


def chunk_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 10,
) -> DataFrame:
    """Sub-document exact dedup (RefinedWeb/CCNet "line dedup"): split every
    document into chunks, drop every repeated chunk CORPUS-WIDE (keep only
    the first occurrence by (doc_id, position)), and reassemble the cleaned
    text — removes boilerplate (headers, nav bars, license blurbs) that
    document-level dedup can't touch because the surrounding text differs.

    Chunk = ``chunk_words`` consecutive words (functions/text.py::word_chunks
    — the splitter is pluggable; real corpora would split on newlines).

    Output: (doc_id, n_chunks, n_kept, text_clean) — one row per input
    document; a fully-deduplicated document survives with ``n_kept = 0``
    and empty ``text_clean`` (filtering those out is the caller's policy).

    Scale posture: two shuffles, both keyed fine-grained — (1) by chunk
    text for keep-first, (2) by doc_id to reassemble. Keep-first is a
    ``min(struct(doc_id, pos))`` AGGREGATE, not a row_number window: the
    aggregate's map-side combine collapses each partition's occurrences of
    a hot chunk before the exchange, where a window would funnel every
    occurrence of a corpus-wide boilerplate chunk (precisely the mass this
    operator removes) through one task. The aggregate's output IS the kept
    set — one row per distinct chunk, no join back. The reassembly
    aggregate carries (pos, chunk) structs — bounded by document size, not
    corpus size. Chunk arrays are derived in one projection per pass; no
    Python, no driver state.
    """
    # localCheckpoint: the chunk arrays feed two consumers under different
    # exchanges (by chunk, by doc_id) — ReuseExchange cannot dedupe them,
    # so without materialization the split + interpreted word_chunks
    # transform would run twice per document
    base = spread(docs).selectExpr(
        id_col, f"{T.split_ws(text_col, S)} AS __w"
    ).selectExpr(
        id_col, f"{T.word_chunks('__w', S, chunk_words)} AS __c"
    ).localCheckpoint()
    exploded = base.select(id_col, F.posexplode("__c").alias("pos", "chunk"))
    kept = (
        exploded.groupBy("chunk")
        .agg(
            F.min(
                F.struct(F.col(id_col).alias("kid"), F.col("pos").alias("kpos"))
            ).alias("__k")
        )
        .select(F.col("__k.kid").alias(id_col), F.col("__k.kpos").alias("pos"), "chunk")
    )
    agg = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, chunk)))"
            ", x -> x.chunk), ' ')"
        ).alias("text_clean"),
    )
    totals = base.select(id_col, F.size("__c").cast("bigint").alias("n_chunks"))
    return totals.join(agg, id_col, "left").select(
        id_col,
        "n_chunks",
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
    )


def content_defined_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 4,
    mask_mod: int = 8,
) -> DataFrame:
    """Content-defined chunk boundaries (the gear/Rabin cut idea behind
    rsync, restic, and FastCDC, applied at token granularity): a new
    chunk starts wherever the ``w``-token gram hash hits the cut mask
    (``hexint(gram) % mask_mod == 0``; expected chunk length is
    ``mask_mod`` tokens), plus a forced boundary at position 1. Because
    boundaries depend only on LOCAL content, inserting or deleting a
    token re-chunks the document only up to the next surviving cut —
    every later chunk is byte-identical again. Fixed-width chunking
    (:func:`chunk_dedup`'s splitter) loses ALL downstream alignment on
    a one-token shift; this is the shift-robust alternative.

    Output: (doc_id, chunk_id, chunk_start, chunk_text), ``chunk_id``
    dense from 1 per document, ``chunk_start`` the 1-based token
    position of the chunk's first token.

    Scale posture: the cut decision at token position p depends only on
    the ``w``-gram STARTING at p, so the flag is computed from the
    carried word array in the SAME projection as the token explode
    (optimization r12, guide §2.4): the separate gram explode, the
    (doc, position) equi-join — two token-grain exchanges — and the
    eager word-array checkpoint of the original shape all disappear;
    the only remaining token-grain exchange is the chunk-id window's
    partition by document (bounded by document length, never corpus
    size). The per-gram md5 count is unchanged (positions 2..n-w+1),
    and the cut set is identical by construction: the old gram at
    explode position gpos0 started at token gpos0+1, exactly the gram
    this projection hashes at wpos0 = gpos0.
    """
    base = spread(docs).selectExpr(id_col, f"{T.split_ws(text_col, S)} AS __w")
    gram = (
        "concat("
        + ", ' ', ".join(T.elem("__w", f"wpos0 + {k + 1}", S) for k in range(w))
        + ")"
    )
    flagged = base.select(
        id_col, "__w", F.posexplode("__w").alias("wpos0", "word")
    ).selectExpr(
        id_col,
        "wpos0 + 1 AS wpos1",
        "word",
        "CASE WHEN wpos0 = 0 THEN 1"
        f" WHEN wpos0 + {w} > {T.asize('__w', S)} THEN 0"
        f" WHEN ({T.hexint(gram, S)} % {mask_mod}) = 0 THEN 1"
        " ELSE 0 END AS flag",
    )
    from pyspark.sql.window import Window

    wdoc = Window.partitionBy(id_col).orderBy("wpos1")
    return (
        flagged.withColumn("cid", F.sum("flag").over(wdoc))
        .groupBy(id_col, "cid")
        .agg(
            F.min("wpos1").alias("chunk_start"),
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(wpos1, word))), x -> x.word), ' ')"
            ).alias("chunk_text"),
        )
        .select(
            id_col,
            F.col("cid").cast("bigint").alias("chunk_id"),
            F.col("chunk_start").cast("bigint").alias("chunk_start"),
            "chunk_text",
        )
    )


def content_chunk_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 4,
    mask_mod: int = 8,
) -> DataFrame:
    """Corpus-wide keep-first dedup over :func:`content_defined_chunks`
    — the shift-robust sibling of :func:`chunk_dedup`: a boilerplate
    passage is removed from later documents even when surrounding
    insertions shift its token offset, because content-defined
    boundaries re-align on the next cut. Keep-first is the reducible
    ``min(struct(doc_id, chunk_start))`` aggregate (chunk_dedup's
    keeper rule — a corpus-wide hot chunk pre-combines map-side),
    keyed on the 32-hex md5 fingerprint rather than the raw chunk text
    so the exchange carries 32-byte keys instead of whole chunks — the
    same key :func:`incremental_chunk_dedup` already dedups on (md5,
    not xxhash64: nothing downstream rejects collisions — the
    kgram_postings rule).

    Output: (doc_id, n_chunks, n_kept, text_clean) — one row per input
    document, matching :func:`chunk_dedup`'s contract.
    """
    chunks = content_defined_chunks(
        docs, text_col, id_col, w, mask_mod
    ).localCheckpoint()
    kept = (
        chunks.withColumn("fh", F.expr("md5(chunk_text)"))
        .groupBy("fh")
        .agg(
            F.min(
                F.struct(
                    F.col(id_col).alias("kid"),
                    F.col("chunk_start").alias("kpos"),
                )
            ).alias("__k"),
            F.first("chunk_text").alias("chunk_text"),
        )
        .select(
            F.col("__k.kid").alias(id_col),
            F.col("__k.kpos").alias("chunk_start"),
            "chunk_text",
        )
    )
    agg = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "struct(chunk_start, chunk_text))), x -> x.chunk_text), ' ')"
        ).alias("text_clean"),
    )
    nc = chunks.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks")
    )
    return (
        spread(docs)
        .select(id_col)
        .join(nc, id_col, "left")
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chunks", F.lit(0)).cast("bigint").alias("n_chunks"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def chunk_fingerprint_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 4,
    mask_mod: int = 8,
) -> DataFrame:
    """(fh, kid, kpos): one md5 fingerprint per DISTINCT content-defined
    chunk corpus-wide, carrying its keep-first owner — the persistable
    chunk index behind :func:`incremental_chunk_dedup`. md5, not
    xxhash64: a probe drops batch chunks on fingerprint equality alone
    (no exact verify rejects collisions), so the key must be
    collision-free in practice — the kgram_postings rule.

    Maintenance mirrors the substring/minhash indexes without needing
    their bucketed-append machinery: the daily flow is probe → accept →
    append the ACCEPTED batch's kept rows (exactly the probe's
    survivors — already novel by construction, so a plain append
    preserves the keep-first invariant and costs O(batch)). A
    production append must still be JOB-ATOMIC (ADVICE r9): use
    ``df.write.mode("append").parquet(path)`` as one Spark job —
    readers see the old index until the job commits and a failed job
    leaves only uncommitted temp files (the
    :func:`append_substring_index` discipline) — never a file-by-file
    copy; a crash mid-append would otherwise leave a partial index
    that silently under-dedups later batches. Periodic bin-packing
    goes through the rename-aside swap
    (:func:`~etl_gamma_spark.sources.sink.compact_small_files`)."""
    chunks = content_defined_chunks(docs, text_col, id_col, w, mask_mod)
    return (
        chunks.selectExpr(
            "md5(chunk_text) AS fh", f"{id_col} AS kid", "chunk_start AS kpos"
        )
        .groupBy("fh")
        .agg(F.min(F.struct("kid", "kpos")).alias("__k"))
        .select("fh", F.col("__k.kid").alias("kid"), F.col("__k.kpos").alias("kpos"))
    )


def append_chunk_index(
    accepted_docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 4,
    mask_mod: int = 8,
    compact_target_mb: int | None = None,
) -> None:
    """Fold an ACCEPTED ingest batch's NOVEL chunk fingerprints into the
    stored chunk index — the maintenance step that closes the chunk-dedup
    ingest loop (probe with :func:`incremental_chunk_dedup` → accept →
    append), mirroring :func:`append_substring_index` (ADVICE r9: the
    append must be job-atomic, never a file-by-file copy). Only the
    batch is chunked, and only fingerprints absent from the stored index
    are written (novelty anti-join on the 32-hex key — the batch's
    probe survivors by construction, so the keep-first invariant
    holds), as ONE Spark append job: readers see the old index until
    the job commits, a failed job leaves only uncommitted temp files.
    Pass ``compact_target_mb`` every N appends to bin-pack the
    directory through the rename-aside swap."""
    spark = accepted_docs.sparkSession
    stored = spark.read.parquet(index_path)
    batch = chunk_fingerprint_index(
        accepted_docs, text_col, id_col, w, mask_mod
    )
    # Materialize the novelty anti-join BEFORE the append job: the probe
    # reads index_path and the append writes into it — relying on Spark's
    # listing snapshot is fragile under concurrent appenders or
    # list-inconsistent committers (ADVICE r10). The eager checkpoint
    # completes the read entirely before any write begins, matching the
    # sibling append helpers (which never read the stored index).
    novel = batch.join(stored.select("fh"), "fh", "left_anti").localCheckpoint(
        eager=True
    )
    novel.write.mode("append").parquet(index_path)
    if compact_target_mb is not None:
        from ..sources.sink import compact_small_files

        compact_small_files(spark, index_path, compact_target_mb)


def incremental_chunk_dedup(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 4,
    mask_mod: int = 8,
) -> DataFrame:
    """Ingest-time content-defined chunk dedup against a persisted
    corpus index (:func:`chunk_fingerprint_index` — live or read back
    from parquet): a batch chunk is dropped if its fingerprint exists in
    the index, then keep-first applies WITHIN the batch (min(struct) by
    (doc_id, chunk_start)); the indexed corpus is never re-chunked —
    the chunk-granularity sibling of :func:`incremental_substring_spans`
    and :func:`incremental_neardup_pairs`.

    Output: (doc_id, n_chunks, n_kept, text_clean) — one row per batch
    document, the :func:`content_chunk_dedup` contract.

    Scale posture: one anti-join keyed on the 32-hex fingerprint (index
    side reduced to one row per distinct chunk), one keep-first
    aggregate, one doc-keyed reassembly — all map-side-combinable, no
    window over corpus-scale keys.
    """
    chunks = content_defined_chunks(
        new_docs, text_col, id_col, w, mask_mod
    ).localCheckpoint()
    fresh = chunks.withColumn("fh", F.expr("md5(chunk_text)")).join(
        index.select("fh"), "fh", "left_anti"
    )
    kept = (
        fresh.groupBy("fh")
        .agg(
            F.min(
                F.struct(
                    F.col(id_col).alias("kid"),
                    F.col("chunk_start").alias("kpos"),
                )
            ).alias("__k"),
            F.first("chunk_text").alias("chunk_text"),
        )
        .select(
            F.col("__k.kid").alias(id_col),
            F.col("__k.kpos").alias("chunk_start"),
            "chunk_text",
        )
    )
    agg = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "struct(chunk_start, chunk_text))), x -> x.chunk_text), ' ')"
        ).alias("text_clean"),
    )
    nc = chunks.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks")
    )
    return (
        spread(new_docs)
        .select(id_col)
        .join(nc, id_col, "left")
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chunks", F.lit(0)).cast("bigint").alias("n_chunks"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def kgram_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """(doc_id, pos, gh): every positional k-token gram of every document,
    keyed by its md5 (0-based ``pos`` = start token index). The posting
    list behind :func:`substring_dup_spans` — one narrow projection per
    row, the word split bound in its own projection first (Spark does not
    CSE a split() repeated inside transform lambdas).

    This frame is also the PERSISTABLE substring index: write it once
    (at corpus scale, bucketed by ``gh`` so batch probes co-locate) and
    every future ingest runs :func:`incremental_substring_spans` against
    the stored postings without re-tokenizing the corpus.

    md5, not xxhash64: there is no downstream exact verification to
    reject hash-collision candidates here (a colliding gram would REPORT
    a false duplicated span), so the join key must be collision-free in
    practice; the 32-hex key is engine-parity-pinned."""
    base = spread(docs).selectExpr(id_col, f"{T.split_ws(text_col, S)} AS __w")
    return base.selectExpr(
        id_col, f"posexplode({T.word_ngrams('__w', S, k)}) AS (pos, gram)"
    ).selectExpr(id_col, "pos", "md5(gram) AS gh")


def substring_dup_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    max_df: int = 50,
) -> DataFrame:
    """Cross-document EXACT duplicated token spans of >= ``k`` tokens
    (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    Better" — the exact-substring complement to MinHash: licensing
    blurbs, quoted boilerplate, memorized passages), re-expressed as an
    anchored k-gram posting-list join instead of a suffix array: a span
    of ``L >= k`` shared tokens is exactly a run of ``L - k + 1``
    consecutive shared k-grams, so matching k-gram anchors and merging
    consecutive matches reconstructs every maximal span.

    Plan: positional k-grams -> md5 posting list -> df-cap (grams with
    more than ``max_df`` occurrences corpus-wide are dropped — the
    stop-gram guard; a hot gram's pair fan-out is quadratic in its df,
    so per-gram join work is bounded at ``max_df²``) -> same-hash
    cross-document pair join -> per (doc_a, doc_b, diagonal) run merge
    (gaps-and-islands; the window partition is bounded by the SHORTER
    document's token count, never by corpus size, so no hot-key
    serialization risk) -> one span row per maximal run.

    Output: (doc_a, doc_b, a_start, b_start, n_tokens), 1-based token
    positions, ``doc_a < doc_b``. A span whose interior crosses a capped
    stop-gram splits into two reported spans (both engines mirror the
    cap, and the split is conservative for dedup).

    Scale posture: the only corpus-wide shuffles are the gram-keyed df
    count (map-side combined) and the posting-list join on the 32-byte
    hash; the posting frame is localCheckpointed so the cap's two passes
    (count + anti-join probe) don't re-run the split/gram derivation.
    """
    _check_span_k(k)
    grams = kgram_postings(docs, text_col, id_col, k).localCheckpoint()
    capped = cap_hot_keys(grams, ["gh"], max_df)
    a = capped.selectExpr(f"{id_col} AS doc_a", "pos AS pa", "gh")
    b = capped.selectExpr(f"{id_col} AS doc_b", "pos AS pb", "gh")
    pairs = (
        a.join(b, "gh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .selectExpr("doc_a", "doc_b", "pa", "pa - pb AS diag")
    )
    return _merge_diagonal_runs(pairs, k, "doc_a", "doc_b", "a_start", "b_start")


def _check_span_k(k: int) -> None:
    if k < 2:
        raise ValueError(
            f"substring spans need k >= 2 tokens (got {k}); at k=1 every "
            "shared vocabulary word is a 'span' and the posting list is "
            "the corpus itself"
        )


def _merge_diagonal_runs(
    pairs: DataFrame,
    k: int,
    a_id: str,
    b_id: str,
    a_start: str,
    b_start: str,
) -> DataFrame:
    """Gaps-and-islands merge of k-gram anchor matches into maximal spans:
    ``pairs`` carries (a_id, b_id, pa, diag = pa - pb); consecutive pa
    values on one (pair, diagonal) are one shared span of run + k - 1
    tokens. The window partition is bounded by the SHORTER document's
    token count (positions within one document pair), never by corpus
    size — the one place a row_number window is hot-key-safe."""
    from pyspark.sql.window import Window

    win = Window.partitionBy(a_id, b_id, "diag").orderBy("pa")
    isl = pairs.withColumn("island", F.col("pa") - F.row_number().over(win))
    return (
        isl.groupBy(a_id, b_id, "diag", "island")
        .agg(F.min("pa").alias("__pa0"), F.count(F.lit(1)).alias("__n"))
        .selectExpr(
            a_id,
            b_id,
            f"CAST(__pa0 + 1 AS BIGINT) AS {a_start}",
            f"CAST(__pa0 + 1 - diag AS BIGINT) AS {b_start}",
            f"CAST(__n + {k} - 1 AS BIGINT) AS n_tokens",
        )
    )


def decontamination_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    bench_mod: int = 23,
    max_df: int = 50,
) -> DataFrame:
    """Exact-substring benchmark decontamination (the primary
    decontamination mode of Lee et al. 2021): every >= ``k``-token span a
    CORPUS document shares verbatim with a BENCHMARK document — stricter
    evidence than n-gram set overlap (``quality.contamination_pairs``):
    a reported span is a contiguous quoted passage, not a bag of shared
    shingles, so it localizes exactly what to strip or drop before
    training.

    The benchmark subset is the deterministic ``doc_id % bench_mod == 0``
    slice of the same table (fixtures carry no separate eval set — same
    convention as contamination_pairs); in production the bench side is
    its own table and the plan is unchanged. Benchmark docs are excluded
    from the corpus side.

    The df-cap counts CORPUS occurrences only: a gram that is corpus
    boilerplate fans out |corpus_df| x |bench_df| rows through one join
    key, so it is dropped (conservative — boilerplate overlap is not
    contamination evidence), while benchmark-side repetition is left
    alone (a benchmark item quoting itself must not mask its corpus
    matches).

    Output: (doc_id, bench_id, doc_start, bench_start, n_tokens),
    1-based token positions.

    Scale posture: identical to :func:`substring_dup_spans` — one
    checkpointed posting pass, a map-side-combined df count, and the
    hash-keyed corpus⋈bench join whose per-gram fan-out is bounded at
    ``max_df`` × bench-df; the run-merge window is bounded by document
    length.
    """
    _check_span_k(k)
    grams = kgram_postings(docs, text_col, id_col, k).localCheckpoint()
    bench = grams.filter((F.col(id_col) % bench_mod) == 0).selectExpr(
        f"{id_col} AS bench_id", "pos AS pb", "gh"
    )
    corpus = grams.filter((F.col(id_col) % bench_mod) != 0)
    corpus = cap_hot_keys(corpus, ["gh"], max_df)
    pairs = corpus.join(bench, "gh").selectExpr(
        id_col, "bench_id", "pos AS pa", "pos - pb AS diag"
    )
    return _merge_diagonal_runs(
        pairs, k, id_col, "bench_id", "doc_start", "bench_start"
    )


def incremental_substring_spans(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    max_df: int = 50,
) -> DataFrame:
    """Incremental exact-substring detection — the daily-ingest path of
    the substring family (the MinHash sibling is
    :func:`incremental_neardup_pairs`): match a NEW batch against an
    already-indexed corpus's k-gram posting list (:func:`kgram_postings`
    output, typically written partitioned and read back from storage)
    without re-reading or re-tokenizing the corpus text. Only the batch
    computes grams; spans come from the hash-keyed batch⋈index join and
    the shared diagonal run merge.

    The df-cap counts INDEX-side occurrences (at 100 TB the index is the
    big side; the batch is assumed ingest-sized): a corpus-boilerplate
    gram would fan out |corpus_df| rows per batch anchor, so it is
    dropped — conservative, same asymmetry as
    :func:`decontamination_spans`. Callers keeping an oracle in sync
    mirror the cap as a HAVING over the corpus posting table.

    Output: (new_id, corpus_id, new_start, corpus_start, n_tokens),
    1-based token positions.
    """
    _check_span_k(k)
    batch = kgram_postings(new_docs, text_col, id_col, k).selectExpr(
        f"{id_col} AS new_id", "pos AS pa", "gh"
    )
    corpus = cap_hot_keys(index, ["gh"], max_df).selectExpr(
        f"{id_col} AS corpus_id", "pos AS pb", "gh"
    )
    pairs = batch.join(corpus, "gh").selectExpr(
        "new_id", "corpus_id", "pa", "pa - pb AS diag"
    )
    return _merge_diagonal_runs(
        pairs, k, "new_id", "corpus_id", "new_start", "corpus_start"
    )


SUBSTRING_INDEX_BUCKETS = 32


def _bucketed_postings(
    docs: DataFrame, text_col: str, id_col: str, k: int, n_buckets: int
) -> DataFrame:
    """Postings plus the layout column ``gbucket`` (hash of the gram key).
    The bucket is LAYOUT ONLY — probes join on ``gh`` and ignore it — so
    xxhash64 is fine here (a bucket collision just co-locates two grams;
    the round-6 banding rule's collision concern applies to JOIN keys)."""
    posts = kgram_postings(docs, text_col, id_col, k)
    posts = posts.withColumn(
        "gbucket", F.pmod(F.xxhash64("gh"), F.lit(n_buckets)).cast("int")
    )
    # cluster by the partition column before the partitioned write: without
    # this every write task holding rows of every bucket emits one file PER
    # bucket (O(tasks × buckets) small files per write wave); after it each
    # bucket directory receives one file per wave. At 100 TB add a secondary
    # spread key inside hot buckets for file-size control — the shuffle is
    # by-key either way.
    return posts.repartition("gbucket")


def write_substring_index(
    docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    n_buckets: int = SUBSTRING_INDEX_BUCKETS,
) -> None:
    """Full (re)build of the PERSISTED substring posting index: the
    :func:`kgram_postings` frame written under ``index_path`` partitioned
    by a gram-hash bucket. One directory per bucket gives the index a
    maintenance unit: appends land at most one file per bucket per task
    wave, compaction and any future re-sort run per bucket, and a
    metastore-bucketed variant of the same layout lets batch probes
    co-locate without shuffling the index side.

    Probe with :func:`incremental_substring_spans` over
    ``spark.read.parquet(index_path)`` (the extra ``gbucket`` column is
    ignored); fold accepted batches in with
    :func:`append_substring_index`."""
    from ..sources.sink import write_full_refresh

    write_full_refresh(
        _bucketed_postings(docs, text_col, id_col, k, n_buckets),
        index_path,
        ["gbucket"],
    )


def append_substring_index(
    accepted_docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    n_buckets: int = SUBSTRING_INDEX_BUCKETS,
    compact_target_mb: int | None = None,
) -> None:
    """Fold an ACCEPTED ingest batch's postings into the stored substring
    index — the maintenance step that closes the daily-ingest loop
    (probe with :func:`incremental_substring_spans` → accept → append),
    the MinHash side's sibling being :func:`minhash_band_index` re-writes.
    Only the batch is tokenized; the stored corpus postings are never
    read, so the append costs O(batch), not O(corpus).

    The write is a job-atomic parquet APPEND into the bucket directories
    (readers see the old index until the job commits; a failed job leaves
    only uncommitted temp files). Appends accrete one file per bucket per
    task wave, so pass ``compact_target_mb`` every N appends to bin-pack
    the directory through the rename-aside swap
    (:func:`~etl_gamma_spark.sources.sink.compact_small_files` — never
    rmtree-then-rename).

    ``k`` and ``n_buckets`` must match the values the index was built
    with: ``k`` is part of the index's semantic contract (mixed-k
    postings would fabricate spans), ``n_buckets`` only of its layout
    (a mismatch fragments directories but probes stay correct).
    """
    batch = _bucketed_postings(accepted_docs, text_col, id_col, k, n_buckets)
    batch.write.mode("append").partitionBy("gbucket").parquet(index_path)
    if compact_target_mb is not None:
        from ..sources.sink import compact_small_files

        compact_small_files(
            accepted_docs.sparkSession,
            index_path,
            compact_target_mb,
            ["gbucket"],
        )


def substring_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    max_df: int = 50,
) -> DataFrame:
    """Keep-first exact-substring pruner over :func:`substring_dup_spans`:
    every token covered by a span duplicating an EARLIER document (the
    ``doc_b`` side of a span — ids order keepers, as everywhere in this
    package) is removed, and the surviving tokens are reassembled in
    order. The first occurrence of every duplicated passage survives
    corpus-wide; later occurrences lose exactly the duplicated tokens.

    Output: (doc_id, n_tokens, n_kept, text_clean) — one row per input
    document (``n_kept = n_tokens`` and untouched text for documents
    with no duplicated span).

    Scale posture: covered positions explode to at most the corpus's
    duplicated-token mass (the mass this operator removes); the rebuild
    is the chunk_dedup reassembly shape — doc-keyed aggregate carrying
    (pos, word) structs, bounded by document size.
    """
    spans = substring_dup_spans(docs, text_col, id_col, k, max_df)
    covered = spans.selectExpr(
        f"doc_b AS {id_col}",
        "explode(sequence(b_start, b_start + n_tokens - 1)) AS wpos1",
    ).distinct()
    base = spread(docs).selectExpr(id_col, f"{T.split_ws(text_col, S)} AS __w")
    return _reassemble_uncovered(base, covered, id_col)


def _reassemble_uncovered(
    base: DataFrame, covered1: DataFrame, id_col: str
) -> DataFrame:
    """Shared strip-and-reassemble tail of the span-acting operators:
    drop every token whose 1-based position appears in ``covered1``
    (id, wpos1) and rebuild the survivors in order. ``base`` carries
    (id, __w); output is (id, n_tokens, n_kept, text_clean), one row per
    ``base`` row. The rebuild is the chunk_dedup reassembly shape —
    doc-keyed aggregate over (pos, word) structs, bounded by document
    size."""
    words = base.selectExpr(id_col, "posexplode(__w) AS (wpos, word)")
    kept = words.join(
        covered1.withColumn("wpos", F.col("wpos1") - 1).drop("wpos1"),
        [id_col, "wpos"],
        "left_anti",
    )
    agg = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(wpos, word)))"
            ", x -> x.word), ' ')"
        ).alias("text_clean"),
    )
    totals = base.select(id_col, F.size("__w").cast("bigint").alias("n_tokens"))
    return totals.join(agg, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
    )


def decontaminate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    bench_mod: int = 23,
    max_df: int = 50,
) -> DataFrame:
    """The ACT step of benchmark decontamination (Lee et al. 2021 strip
    mode): remove from every corpus document each token covered by a
    verbatim >= ``k``-token benchmark span (:func:`decontamination_spans`
    output) and reassemble the survivors — the strip-not-drop policy
    that keeps a mostly-clean document in the training set while
    guaranteeing no quoted benchmark passage survives. The substring
    sibling is :func:`substring_dedup` (find -> act, same reassembly).

    Output: (doc_id, n_tokens, n_kept, text_clean) — one row per CORPUS
    document (benchmark docs are not training data and are excluded);
    documents with no benchmark overlap pass through untouched.

    Scale posture: the span search is decontamination_spans unchanged
    (checkpointed postings, corpus-side df-cap); the added cost is the
    covered-position explode — bounded by the corpus's contaminated-token
    mass, exactly the mass being removed — plus the doc-keyed reassembly
    aggregate.
    """
    spans = decontamination_spans(docs, text_col, id_col, k, bench_mod, max_df)
    covered = spans.selectExpr(
        id_col,
        "explode(sequence(doc_start, doc_start + n_tokens - 1)) AS wpos1",
    ).distinct()
    base = (
        spread(docs)
        .filter((F.col(id_col) % bench_mod) != 0)
        .selectExpr(id_col, f"{T.split_ws(text_col, S)} AS __w")
    )
    return _reassemble_uncovered(base, covered, id_col)


def intradoc_repeat_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    max_rep: int = 50,
) -> DataFrame:
    """WITHIN-document exact repeated token spans of >= ``k`` tokens —
    the act-ready complement of the Gopher repetition SIGNALS
    (``quality.gopher_repetition`` measures duplicate-line/n-gram
    fractions; this localizes each repeat): a span repeats earlier text
    in the SAME document iff a run of consecutive k-gram anchors matches
    at one offset ``diag >= 1``, so the cross-document diagonal merge of
    :func:`substring_dup_spans` applies unchanged with the posting join
    keyed on (doc, gram) instead of gram.

    Output: (doc_id, rep_start, first_start, n_tokens), 1-based token
    positions — the span at ``rep_start`` repeats the text at
    ``first_start`` (``rep_start - first_start = diag >= 1``). Periodic
    text reports one maximal span per period multiple, exactly like the
    cross-document operator reports one span per diagonal.

    The cap is per-(document, gram) occurrence count (``max_rep``): a
    gram repeated m times within one document fans out m(m-1)/2 pair
    rows, so per-key join work is bounded at ``max_rep``²; corpus-wide
    gram frequency is irrelevant here and deliberately NOT capped (a
    common phrase repeated twice in one doc is still a within-doc
    repeat). Window partitions are (doc, diag) — bounded by document
    length, never corpus size.
    """
    _check_span_k(k)
    grams = kgram_postings(docs, text_col, id_col, k).localCheckpoint()
    capped = cap_hot_keys(grams, [id_col, "gh"], max_rep)
    a = capped.selectExpr(id_col, "pos AS pa", "gh")
    b = capped.selectExpr(id_col, "pos AS pb", "gh")
    pairs = (
        a.join(b, [id_col, "gh"])
        .filter(F.col("pa") > F.col("pb"))
        .selectExpr(
            f"{id_col} AS doc_a", f"{id_col} AS doc_b", "pa", "pa - pb AS diag"
        )
    )
    spans = _merge_diagonal_runs(
        pairs, k, "doc_a", "doc_b", "rep_start", "first_start"
    )
    return spans.selectExpr(
        f"doc_a AS {id_col}", "rep_start", "first_start", "n_tokens"
    )


def strip_intradoc_repeats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    max_rep: int = 50,
) -> DataFrame:
    """Keep-first pruner over :func:`intradoc_repeat_spans`: every token
    covered by a span repeating EARLIER text in the same document (the
    ``rep_start`` side) is removed and the survivors reassembled in
    order — position order decides keepers within a document, the same
    convention id order sets corpus-wide in :func:`substring_dedup`.
    On periodic text the union of per-diagonal spans covers everything
    after the first period, so exactly one copy survives.

    Output: (doc_id, n_tokens, n_kept, text_clean) — one row per input
    document; repeat-free documents pass through untouched.

    ONE-PASS contract (same as the cross-document pruner and Lee et
    al.'s ExactSubstr strip): removing a span makes its neighbors
    adjacent, and the new adjacency can itself form a >= k-token repeat
    of earlier text — measured on the fuzz corpus, a second pass finds
    a handful of new (always shorter-boundary) spans. Callers needing a
    repeat-FREE guarantee iterate to fixpoint; one pass removes the
    detected repeated mass, which is the curation use case.

    Scale posture: the covered-position explode is bounded by each
    document's repeated-token mass (the mass removed); the rebuild is
    the shared :func:`_reassemble_uncovered` doc-keyed aggregate.
    """
    spans = intradoc_repeat_spans(docs, text_col, id_col, k, max_rep)
    covered = spans.selectExpr(
        id_col,
        "explode(sequence(rep_start, rep_start + n_tokens - 1)) AS wpos1",
    ).distinct()
    base = spread(docs).selectExpr(id_col, f"{T.split_ws(text_col, S)} AS __w")
    return _reassemble_uncovered(base, covered, id_col)


def novelty_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-document corpus novelty: what fraction of a document's distinct
    word shingles appear in NO other document (RefinedWeb's duplicate-
    n-gram-fraction signal, inverted) — low novelty flags near-duplicated
    or boilerplate-heavy documents for pruning even when no single pair
    crosses a dedup threshold.

    Output: (doc_id, n_shingles, n_unique, novelty_permille) — the ratio
    as an INTEGER permille (``(unique·1000) div total``), engine-exact.

    Scale posture: shingle explode → shingle-keyed df aggregate (map-side
    combinable; hot boilerplate shingles collapse per partition) → one
    doc-keyed re-aggregate. No windows, no joins against raw text.
    """
    shingles = shingle_sets(docs, text_col, id_col, n)
    with_df = shingles.join(
        shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df")), "shingle"
    )
    return (
        with_df.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("__df") == 1, 1).otherwise(0)).alias("n_unique"),
        )
        .selectExpr(
            id_col,
            "CAST(n_shingles AS BIGINT) AS n_shingles",
            "CAST(n_unique AS BIGINT) AS n_unique",
            "(n_unique * 1000) DIV n_shingles AS novelty_permille",
        )
    )


def boilerplate_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 10,
    k: int = 50,
) -> DataFrame:
    """Corpus boilerplate report: the ``k`` most-repeated chunks with their
    occurrence and document counts — the diagnostic run BEFORE
    :func:`chunk_dedup` to see what sub-document mass dedup will remove
    (nav bars, license blurbs, headers).

    Scale posture: explode → one hash aggregate keyed by chunk (map-side
    combine collapses hot chunks per partition) → ``TakeOrderedAndProject``
    top-k (no global sort). Ties at the cut break on chunk text — a total
    order, so the k-th row is engine-deterministic.
    """
    base = spread(docs).selectExpr(
        id_col, f"{T.split_ws(text_col, S)} AS __w"
    ).selectExpr(id_col, f"{T.word_chunks('__w', S, chunk_words)} AS __c")
    return (
        base.select(id_col, F.explode("__c").alias("chunk"))
        .groupBy("chunk")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), "chunk")
        .limit(k)
    )


def cluster_prune(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "n_chars",
) -> DataFrame:
    """Select ONE representative document per near-duplicate cluster — the
    corpus-pruning step that turns :func:`neardup_clusters` labels into a
    deduplicated training set (keep the highest-``score_col`` member, ties
    to the lowest id — a total order, so the choice is deterministic).

    Output: (doc_id, cluster_id, <score_col>, n_members) — one row per
    cluster; ``n_members`` is the cluster size, so downstream bookkeeping
    (how much mass dedup removed per cluster) needs no second pass.

    Scale posture: a single hash aggregate keyed by cluster_id —
    ``min(struct(-score, id))`` is an ordinary reducible aggregate, so
    map-side combine collapses each partition's cluster members before the
    exchange. No window over the cluster partition: a degenerate corpus
    (everything near-identical → one giant cluster) would funnel that
    cluster's every row through a single window task, while the agg only
    funnels pre-combined partials.
    """
    joined = docs.select(id_col, score_col).join(clusters, id_col)
    return (
        joined.groupBy("cluster_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col(score_col)).alias("neg_score"),
                    F.col(id_col).alias("rep_id"),
                )
            ).alias("__best"),
            F.count("*").alias("n_members"),
        )
        .select(
            F.col("__best.rep_id").alias(id_col),
            "cluster_id",
            (-F.col("__best.neg_score")).alias(score_col),
            "n_members",
        )
    )


def minhash_jaccard_calibration(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_bucket: int = 1024,
) -> DataFrame:
    """Calibration table for the banded MinHash estimator: for every LSH
    candidate pair, compare the estimated Jaccard (matches/16) against
    the EXACT Jaccard over the full shingle sets, bucketed by the
    estimator's own 17-point support (matches in 0..16) — what an
    operator reads before committing a dedup threshold: which estimate
    level corresponds to which true similarity, and how wide the error
    band is at each level.

    Output: (matches16, n_pairs, sum_true, sum_abs_err, avg_true,
    avg_abs_err) — one row per occupied estimator level.

    Exactness/parity: est = m/16 has the exact scale-9 decimal expansion
    m * 62500000 * 1e-9; true Jaccard is a ratio of ints rounded HALF_UP
    at scale 9, tie-free by construction (a scale-9 tie needs a reduced
    denominator q | 2e9 with 2e9/q odd — impossible for shingle-set
    sizes, since 2e9/q >= 1e6 is even for q <= 2000); per-pair absolute
    errors are exact decimal subtractions, bucket sums are exact decimal
    sums (order-independent), and the averages use the non-negative
    HALF_UP integer-division form (lm_bigram_nll's worked example).

    Scale posture: candidates come from the banded, bucket-capped LSH
    join (never all-pairs); exact intersections are computed ONLY for
    candidate pairs by routing pair ids through the shingle posting
    frame (fan-out bounded by pairs x shingles-per-doc — the pairs and
    postings frames are each materialized once, two consumers each);
    the report is one 17-row-bounded hash aggregate.

    Optimization r12 (guide §2.4): the corpus is tokenized ONCE — the
    exploded shingle checkpoint feeds BOTH the signature pipeline
    (via minhash_lsh_pairs' ``shingles=`` passthrough) and the exact
    intersections; before, minhash_lsh_pairs re-split and re-shingled
    every document internally.
    """
    sh = shingle_sets(docs, text_col, id_col, n).localCheckpoint()
    pairs = minhash_lsh_pairs(
        docs, text_col, id_col, n, max_bucket, shingles=sh
    ).localCheckpoint()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    shared = (
        pairs.select("doc_a", "doc_b")
        .join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_shared"))
    )
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    per = (
        pairs.join(shared, ["doc_a", "doc_b"], "left")
        .join(na, "doc_a")
        .join(nb, "doc_b")
        .selectExpr(
            "CAST(round(est_jaccard * 16) AS INT) AS matches16",
            "CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared",
            "n_a",
            "n_b",
        )
        .selectExpr(
            "matches16",
            "CAST(round(CAST(n_shared AS DOUBLE)"
            " / CAST(n_a + n_b - n_shared AS DOUBLE), 9)"
            " AS DECIMAL(18,9)) AS true9",
            "CAST(CAST(matches16 * 62500000 AS DECIMAL(18,0))"
            " * CAST(0.000000001 AS DECIMAL(10,9))"
            " AS DECIMAL(18,9)) AS est9",
        )
    )
    g = per.groupBy("matches16").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_pairs"),
        F.expr("CAST(SUM(true9) AS DECIMAL(18,9))").alias("sum_true"),
        F.expr("CAST(SUM(abs(est9 - true9)) AS DECIMAL(18,9))").alias(
            "sum_abs_err"
        ),
    )
    return g.selectExpr(
        "matches16",
        "n_pairs",
        "sum_true",
        "sum_abs_err",
        "CAST(CAST(sum_true AS DECIMAL(19,9)) * 1000000000 AS BIGINT)"
        " AS __ut",
        "CAST(CAST(sum_abs_err AS DECIMAL(19,9)) * 1000000000 AS BIGINT)"
        " AS __ue",
    ).selectExpr(
        "matches16",
        "n_pairs",
        "sum_true",
        "sum_abs_err",
        "CAST(CAST((2 * __ut + n_pairs) DIV (2 * n_pairs) AS DECIMAL(18,0))"
        " * CAST(0.000000001 AS DECIMAL(10,9)) AS DECIMAL(18,9)) AS avg_true",
        "CAST(CAST((2 * __ue + n_pairs) DIV (2 * n_pairs) AS DECIMAL(18,0))"
        " * CAST(0.000000001 AS DECIMAL(10,9)) AS DECIMAL(18,9))"
        " AS avg_abs_err",
    )


def minhash_banded_sigs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, m0..m15, band0..band3), materialized: the checkpointed
    signature+band-key frame behind :func:`minhash_band_index`. Exposed
    so a caller that needs several SLICES of one corpus (the maintain
    carriers: build half, append half, probe batch) can run the
    shingle-md5-minhash pipeline ONCE and filter the checkpoint per
    slice — signatures are per-document, so slicing after computing is
    bit-identical to computing per slice (optimization r12, guide §2.4:
    one pass + one materialization instead of three)."""
    sigs = minhash_signatures(docs, text_col, id_col, n)
    m_cols = [f"m{j}" for j in range(T.MINHASH_K)]
    # Materialize before the band union: Spark does not CSE across union
    # branches, so without this each of the MINHASH_BANDS branches would
    # re-run the whole shingle-md5 + minhash-fold pipeline (the dominant
    # cost) from the docs scan — same reason minhash_lsh_pairs
    # checkpoints its signature frame.
    return sigs.selectExpr(
        id_col, *m_cols, *T.band_key_exprs(S)
    ).localCheckpoint()


def minhash_band_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    banded: DataFrame | None = None,
) -> DataFrame:
    """Persistable banded-MinHash index: one (band, bkey, id, m0..m15)
    row per band per document. Written once (partition by ``band`` so a
    probe prunes to its band's files), it lets every FUTURE ingest dedupe
    against the corpus without re-reading or re-signing it — see
    :func:`incremental_neardup_pairs`. The signature columns ride along
    so the verify stage needs no second corpus lookup.

    ``banded`` (a :func:`minhash_banded_sigs` frame or a filtered slice
    of one) skips the signature pipeline — the shared-derivation path of
    the maintain carriers."""
    if banded is None:
        banded = minhash_banded_sigs(docs, text_col, id_col, n)
    m_cols = [f"m{j}" for j in range(T.MINHASH_K)]
    out = None
    for band in range(T.MINHASH_BANDS):
        part = banded.select(
            F.col(id_col),
            *[F.col(c) for c in m_cols],
            F.lit(band).alias("band"),
            F.col(f"band{band}").alias("bkey"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def write_minhash_index(
    docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    banded: DataFrame | None = None,
) -> None:
    """Full (re)build of the persisted banded-MinHash index: the
    :func:`minhash_band_index` frame written under ``index_path``
    PARTITIONED BY ``band`` (the probe's equi-join key prefix, so a
    band-sliced read prunes to one directory per band). The substring
    sibling is :func:`write_substring_index`; probe with
    :func:`incremental_neardup_pairs` over the read-back. ``banded``
    passes a precomputed :func:`minhash_banded_sigs` slice through."""
    from ..sources.sink import write_full_refresh

    rows = minhash_band_index(docs, text_col, id_col, n, banded=banded)
    # cluster by the partition column first — same rule as the substring
    # index writer: one file per band directory per write wave instead of
    # one per (task, band)
    write_full_refresh(rows.repartition("band"), index_path, ["band"])


def append_minhash_index(
    accepted_docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    compact_target_mb: int | None = None,
    banded: DataFrame | None = None,
) -> None:
    """Fold an ACCEPTED ingest batch into the stored MinHash band index —
    the maintenance step of the incremental near-dup loop (probe with
    :func:`incremental_neardup_pairs` → accept → append), sibling of
    :func:`append_substring_index`. Only the batch is shingled and
    signed; the stored corpus rows are never read, so the append costs
    O(batch). Job-atomic parquet append; pass ``compact_target_mb``
    every N appends to bin-pack the band directories through the
    rename-aside swap. ``banded`` passes a precomputed
    :func:`minhash_banded_sigs` slice through."""
    rows = minhash_band_index(accepted_docs, text_col, id_col, n, banded=banded)
    rows.repartition("band").write.mode("append").partitionBy(
        "band"
    ).parquet(index_path)
    if compact_target_mb is not None:
        from ..sources.sink import compact_small_files

        compact_small_files(
            rows.sparkSession, index_path, compact_target_mb, ["band"]
        )


def incremental_neardup_pairs(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 1024,
    new_banded: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup detection — the daily-ingest path: match a
    NEW batch against an already-indexed corpus (``minhash_band_index``
    output, typically read back from storage) without touching the corpus
    text. Only the batch computes signatures; candidates come from the
    (band, bkey) equi-join against the index, and the MinHash-estimated
    Jaccard verifies using the signature columns both sides already
    carry. Returns (new_id, corpus_id, est_jaccard).

    Corpus buckets holding more than ``max_bucket`` documents are dropped
    before the probe (the boilerplate-bucket guard, counted over the
    INDEX side — at 100 TB the index is the big side; the batch is
    assumed ingest-sized). Callers keeping an oracle in sync mirror the
    cap as a HAVING on the corpus band table.

    ``new_banded`` passes a precomputed :func:`minhash_banded_sigs`
    slice for the batch through (shared-derivation maintain path).
    """
    m_cols = [f"m{j}" for j in range(T.MINHASH_K)]
    # minhash_band_index checkpoints the signature frame itself; the
    # band union over it is a cheap projection, no second checkpoint.
    new_idx = minhash_band_index(new_docs, text_col, id_col, banded=new_banded)
    corpus_ok = cap_hot_keys(index, ["band", "bkey"], max_bucket)
    left = new_idx.select(
        F.col(id_col).alias("new_id"),
        *[F.col(c).alias(f"a_{c}") for c in m_cols],
        "band",
        "bkey",
    )
    right = corpus_ok.select(
        F.col(id_col).alias("corpus_id"),
        *[F.col(c).alias(f"b_{c}") for c in m_cols],
        "band",
        "bkey",
    )
    cand = (
        left.join(right, ["band", "bkey"])
        .select("new_id", "corpus_id")
        .distinct()
    )
    # one signature row per doc WITHOUT a distinct shuffle: every doc has
    # exactly one row per band (minhash_band_index contract), so band 0
    # is already the deduplicated signature table
    sa = new_idx.filter(F.col("band") == 0).select(
        F.col(id_col).alias("new_id"),
        *[F.col(c).alias(f"a_{c}") for c in m_cols],
    )
    sb = index.filter(F.col("band") == 0).select(
        F.col(id_col).alias("corpus_id"),
        *[F.col(c).alias(f"b_{c}") for c in m_cols],
    )
    matches = " + ".join(
        f"CASE WHEN a_{c} = b_{c} THEN 1 ELSE 0 END" for c in m_cols
    )
    return (
        cand.join(sa, "new_id")
        .join(sb, "corpus_id")
        .selectExpr(
            "new_id",
            "corpus_id",
            f"CAST(({matches}) AS DOUBLE) / {T.MINHASH_K}.0 AS est_jaccard",
        )
    )


def boilerplate_share(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 10,
) -> DataFrame:
    """Per-document boilerplate signal: what fraction of a document's
    chunks occur elsewhere in the corpus — the CCNet-style "duplicated
    line share" quality feature. :func:`chunk_dedup` REMOVES repeated
    chunks; this MEASURES them per document without rewriting anything
    (a high share marks templated/nav-heavy pages for the quality gate;
    the two share the word_chunks splitter).

    Output: (doc_id, n_chunks BIGINT, dup_chunks BIGINT,
    boilerplate_permille BIGINT) — dup counts chunk occurrences whose
    chunk text appears >= 2 times corpus-wide (including within one
    document: internal repetition is boilerplate too).

    Chunk keys are md5, not xxhash64 — no downstream exact verification
    exists to reject collisions (the round-8 posting-key rule), and the
    shuffle carries 32-hex keys instead of chunk text either way.

    Scale posture: the chunk occurrence frame (doc_id, md5) is
    materialized once and feeds both consumers (the chunk-df aggregate
    and the join-back probe — differing plans, exchange reuse cannot
    fire); the df aggregate is map-side combined, so a corpus-wide hot
    chunk arrives at its reducer pre-collapsed; the join back is
    chunk-keyed (AQE-sized, never broadcast — the df table is
    corpus-scale) and the final aggregate is doc-keyed. No windows,
    no pairs.
    """
    base = spread(docs).selectExpr(
        id_col, f"{T.split_ws(text_col, S)} AS __w"
    ).selectExpr(
        id_col, f"{T.word_chunks('__w', S, chunk_words)} AS __c"
    )
    occ = base.select(
        id_col, F.explode("__c").alias("__chunk")
    ).selectExpr(id_col, "md5(__chunk) AS __h").localCheckpoint()
    dfs = occ.groupBy("__h").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("__df")
    )
    per = (
        occ.join(dfs, "__h")
        .groupBy(id_col)
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_chunks"),
            F.expr(
                "CAST(SUM(CASE WHEN __df > 1 THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("dup_chunks"),
        )
    )
    share = T.idiv(
        f"2000 * {T.wint('dup_chunks', S)} + n_chunks", "2 * n_chunks", S
    )
    return per.selectExpr(
        id_col,
        "n_chunks",
        "dup_chunks",
        f"CAST({share} AS BIGINT) AS boilerplate_permille",
    )
