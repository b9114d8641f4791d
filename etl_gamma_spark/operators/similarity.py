"""Similarity search over embedding columns (extension surface;
BASELINE.json north star): brute-force cosine top-k as the exact baseline,
a k-NN self-join, and a sign-random-projection LSH bucketed variant as the
scale path.

All dot products are sequential left-to-right folds over the vector
(``aggregate(zip_with(...))``), which is bit-identical to DuckDB's
``list_dot_product`` — verified — so these operators are fully
oracle-checkable despite floating point.

Scale posture: brute force is O(N·Q) with a broadcast query side — right
for reranking and small Q. The LSH variant buckets vectors by the sign
pattern of ``n_planes`` deterministic hyperplanes (derived from md5, no
RNG), so candidate generation is an equi-join on the bucket key: the
100 TB path (bucket sizes ~N/2^planes), trading recall for a
shuffle-free-probe design; recall is measured in tests against brute
force.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..io import spread

S = T.SPARK

DOT = (
    "aggregate(zip_with(CAST({a} AS ARRAY<DOUBLE>), CAST({b} AS ARRAY<DOUBLE>),"
    " (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
)
NORM = "sqrt(" + DOT.format(a="{v}", b="{v}") + ")"


def cosine_expr(a: str, b: str) -> str:
    dot = DOT.format(a=a, b=b)
    na = NORM.format(v=a)
    nb = NORM.format(v=b)
    # try_divide: a zero-norm (all-zeros / padding) vector must yield NULL
    # cosine, not a DIVIDE_BY_ZERO job abort under Spark's default ANSI
    # mode; NULLs drop out of thresholds and sort last in rankings.
    # try_divide over x/nullif(y,0): identical values (same IEEE divide,
    # NULL exactly when the denominator is 0), but nullif duplicates the
    # denominator into an If — Spark 4's common-expression rewrite then
    # splits the projection in two, and a two-level Project between Sort
    # and Limit breaks the Limit(Project(Sort)) -> TakeOrderedAndProject
    # pattern, forcing a rangepartitioning exchange (whose boundary
    # sampling re-executes the child) on every rerank cut (measured:
    # plans/r12/embedding_sq8_topk_*.txt).
    return f"try_divide(({dot}), ({na}) * ({nb}))"


def dot_unrolled(a: str, b: str, dim: int) -> str:
    """Dot product as a flat 64-term expression over pre-cast DOUBLE
    arrays. Same left-to-right addition order as the aggregate() fold and
    DuckDB's list_dot_product (bit-identical results), but whole-stage
    codegen compiles it — higher-order-function lambdas are interpreted
    per element, which dominates pairwise workloads."""
    terms = " + ".join(
        f"(element_at({a}, {i}) * element_at({b}, {i}))" for i in range(1, dim + 1)
    )
    return f"({terms})"


def dist2_unrolled(a: str, b: str, dim: int, d: str = S) -> str:
    """Squared L2 distance as a flat unrolled left-associative chain —
    generated for BOTH dialects so centroid assignment ranks identically
    in Spark and DuckDB (every term computed the same way, summed in the
    same order → bit-identical doubles)."""
    if d == S:
        el = lambda v, i: f"element_at({v}, {i})"  # noqa: E731
    else:
        el = lambda v, i: f"{v}[{i}]"  # noqa: E731 (DuckDB arrays 1-indexed)
    terms = " + ".join(
        f"(({el(a, i)} - {el(b, i)}) * ({el(a, i)} - {el(b, i)}))"
        for i in range(1, dim + 1)
    )
    return f"({terms})"


def bcast_attach(
    probe: DataFrame,
    build: DataFrame,
    probe_key_src: str,
    build_key_src: str,
) -> DataFrame:
    """Attach a small broadcast frame to every probe row WITHOUT a
    BroadcastNestedLoopJoin.

    ``crossJoin(broadcast(q))`` plans as BNLJ, which disables whole-stage
    codegen for the entire probe-side stage — exactly the stage holding the
    unrolled scoring arithmetic (CLAUDE.md: measured ~2.5× on such stages).
    Joining on a constant key derived FROM A COLUMN (``hash(src) % 1`` —
    always 0, but not foldable, so Catalyst cannot simplify the condition
    to literal true and fall back to a cross join) yields a
    BroadcastHashJoin with identical output rows and codegen intact.

    ``hash`` accepts any column type (ints, text, dates, arrays) and never
    returns NULL (NULL input hashes to the seed), so rows with NULL keys
    keep the cross-join row semantics this helper replaces; the coalesce
    is belt-and-braces only.
    """
    for side, frame in (("probe", probe), ("build", build)):
        if "__j" in frame.columns:
            raise ValueError(
                f"bcast_attach: {side} frame already carries a '__j' column; "
                "rename it first (the helper uses '__j' as its join key)"
            )
    p = probe.withColumn(
        "__j", F.coalesce(F.hash(F.col(probe_key_src)) % 1, F.lit(0)).cast("int")
    )
    b = build.withColumn(
        "__j", F.coalesce(F.hash(F.col(build_key_src)) % 1, F.lit(0)).cast("int")
    )
    return p.join(F.broadcast(b), "__j").drop("__j")


def brute_force_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to the vector with ``query_id``
    (query broadcast; ties broken by id for determinism)."""
    q = embeddings.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("qv"), F.col(id_col).alias("__qid")
    )
    scored = bcast_attach(
        embeddings.filter(F.col(id_col) != query_id), q, id_col, "__qid"
    ).selectExpr(id_col, f"{cosine_expr(vec_col, 'qv')} AS cosine")
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def knn_join(
    embeddings: DataFrame,
    n_queries: int = 20,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors for each of the first ``n_queries`` vectors
    (broadcast query side + per-query window top-k)."""
    q = embeddings.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    scored = (
        bcast_attach(embeddings, q, id_col, "query_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .selectExpr("query_id", id_col, f"{cosine_expr(vec_col, 'qv')} AS cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


# --- LSH (sign random projection) -----------------------------------------


def plane_component(plane: int, dim_i: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1]:
    md5-derived integer of (plane, dim) scaled — no RNG, and exactly the
    value both SQL engines would compute from the same md5 prefix."""
    import hashlib

    h = int(hashlib.md5(f"p{plane}_{dim_i}".encode()).hexdigest()[:15], 16)
    return (h % 2001 - 1000) / 1000.0


def _plane_literal(plane: int, dim: int, d: str) -> str:
    """The hyperplane as a SQL literal array: planes are constants, so
    bake them into the plan instead of recomputing dim·planes md5 hashes
    per ROW (Spark does not constant-fold inside transform lambdas)."""
    vals = ", ".join(repr(plane_component(plane, i)) for i in range(1, dim + 1))
    if d == S:
        return f"CAST(array({vals}) AS ARRAY<DOUBLE>)"
    return f"CAST([{vals}] AS DOUBLE[])"


def bucket_expr(vec_col: str, dim: int, n_planes: int, d: str = S) -> str:
    """Bucket id = packed sign bits of the vector·plane dots.

    Spark side uses an UNROLLED dot with each plane component inlined as a
    SCALAR literal (codegen; the HOF fold is interpreted per element —
    measured ~8× slower for bucket assignment). Inlining the scalars —
    rather than element_at over a 64-element array literal per term —
    keeps the expression ~60× smaller (294 KB → 5 KB of SQL for 8 planes),
    which cut multi-second parse/analyze overhead off every LSH query;
    Catalyst constant-folded the array form to the same scalars, so the
    arithmetic (per-term products, left-to-right sum) is bit-identical.
    DuckDB's list_dot_product folds the same order over the compact array
    literal.
    """
    bits = []
    for p in range(n_planes):
        if d == S:
            dot = " + ".join(
                f"(element_at(CAST({vec_col} AS ARRAY<DOUBLE>), {i})"
                f" * {plane_component(p, i)!r}D)"
                for i in range(1, dim + 1)
            )
        else:
            plane_arr = _plane_literal(p, dim, d)
            dot = f"list_dot_product(CAST({vec_col} AS DOUBLE[]), {plane_arr})"
        bits.append(f"CASE WHEN ({dot}) >= 0 THEN {1 << p} ELSE 0 END")
    return "(" + " + ".join(bits) + ")"


def lsh_buckets(
    embeddings: DataFrame,
    dim: int = 64,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket): sign-random-projection bucket per vector.
    Spread first: the code projection (and everything checkpointed from
    it) otherwise inherits a 1-partition local read and runs single-core
    (no-op at scale)."""
    return spread(embeddings).selectExpr(
        id_col, vec_col, f"{bucket_expr(vec_col, dim, n_planes)} AS bucket"
    )


def hamming_expr(a: str, b: str, d: str = S) -> str:
    """Hamming distance between two packed bucket codes. Dialect split:
    Spark XOR is ``^`` but DuckDB's ``^`` is POWER — DuckDB uses xor()."""
    if d == S:
        return f"bit_count({a} ^ {b})"
    return f"bit_count(xor({a}, {b}))"


def lsh_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    probe_radius: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-probe LSH: score only vectors whose
    bucket code is within Hamming distance ``probe_radius`` of the
    query's — a tunable recall/cost dial (radius 3 of 8 planes probes
    ~36% of buckets; radius 0 probes one).

    At 100 TB, ``lsh_buckets`` is precomputed and partitioned by bucket so
    a probe touches only the matching partitions; here both sides derive
    lazily from the same scan.
    """
    b = lsh_buckets(embeddings, dim, n_planes, id_col, vec_col)
    q = b.filter(F.col(id_col) == query_id).select(
        F.col("bucket").alias("qbucket"),
        F.col(vec_col).alias("qv"),
        F.col(id_col).alias("__qid"),
    )
    cand = (
        bcast_attach(b, q, id_col, "__qid")
        .filter(F.expr(f"{hamming_expr('bucket', 'qbucket')} <= {probe_radius}"))
        .filter(F.col(id_col) != query_id)
    )
    scored = cand.selectExpr(id_col, f"{cosine_expr(vec_col, 'qv')} AS cosine")
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


# --- IVF (inverted-file / coarse quantizer) --------------------------------


def seed_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse-quantizer seeds: the first ``n_centroids``
    vectors by id, re-labeled with dense centroid_id 0..n-1. This is the
    oracle-checkable quantizer the registered IVF queries use; Lloyd's
    refinement (``train_centroids``) is the offline quality upgrade."""
    return (
        embeddings.orderBy(id_col)
        .limit(n_centroids)
        .selectExpr(f"{id_col} AS __seed", f"CAST({vec_col} AS ARRAY<DOUBLE>) AS centroid")
        .withColumn(
            "centroid_id",
            (F.row_number().over(Window.orderBy("__seed")) - 1).cast("int"),
        )
        .select("centroid_id", "centroid")
    )


def _assign_to(
    emb: DataFrame,
    cents: DataFrame,
    dim: int,
    id_col: str,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Nearest-centroid assignment: broadcast the (small) centroid table,
    pick the argmin of the unrolled codegen'd squared distance with
    centroid_id tiebreak. Input emb must carry a pre-cast ``v``
    array<double> column.

    The argmin is a reducible ``min(struct(d2, centroid_id))`` aggregate
    (lexicographic struct order == the (d2, centroid_id) sort), NEVER a
    row_number window: the scored frame is |emb| x K rows each dragging
    the 64-double vector, and a window must shuffle ALL of it into
    per-vector sort partitions — measured 29 min for K=782 x 200k
    vectors, where the map-side-combined aggregate reduces each vector's
    K candidates to one row before the exchange (the round-5 keep-first
    rule; same bit-identical winner).

    ``carry`` columns ride through the aggregate via first() — they are
    constant within each id's K fan-out rows, so first() is
    deterministic regardless of combine order."""
    scored = bcast_attach(emb, cents, id_col, "centroid_id").selectExpr(
        id_col,
        "v",
        *carry,
        "centroid_id",
        f"{dist2_unrolled('v', 'centroid', dim)} AS d2",
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.min(F.struct("d2", "centroid_id")).alias("__best"),
            F.first("v").alias("v"),
            *[F.first(c).alias(c) for c in carry],
        )
        .select(
            id_col,
            "v",
            *carry,
            F.col("__best.centroid_id").alias("centroid_id"),
        )
    )


def train_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means refinement from the deterministic seeds: the
    *offline index-training* step — run once when (re)building the index,
    never inside a query. Iteration count is fixed and small; IVF needs a
    coarse quantizer, not a converged clustering. Each iteration is one
    broadcast-join + one groupBy; no driver-side data."""
    emb = embeddings.selectExpr(id_col, f"CAST({vec_col} AS ARRAY<DOUBLE>) AS v")
    centroids = seed_centroids(embeddings, n_centroids, id_col, vec_col)
    for _ in range(n_iters):
        assign = _assign_to(emb, centroids, dim, id_col)
        # recompute: element-wise mean per centroid via posexplode + re-agg.
        # localCheckpoint per round: truncates the iterative lineage and
        # stops callers re-running every iteration
        centroids = (
            assign.selectExpr("centroid_id", "posexplode(v) AS (pos, x)")
            .groupBy("centroid_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .selectExpr("centroid_id", "transform(pm, s -> s.m) AS centroid")
            .localCheckpoint()
        )
    return centroids


def ivf_build(
    embeddings: DataFrame,
    centroids: DataFrame,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Precompute the inverted file: (vec_id, centroid_id) against the
    given centroids. At 100 TB this table is written out partitioned by
    centroid_id so a probe scans only the probed cells; here it is
    localCheckpointed so repeated searches don't re-assign."""
    emb = embeddings.selectExpr(id_col, f"CAST({vec_col} AS ARRAY<DOUBLE>) AS v")
    return _assign_to(emb, centroids, dim, id_col).select(id_col, "centroid_id").localCheckpoint()


def ivf_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    index: tuple[DataFrame, DataFrame] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: score only vectors assigned to the ``n_probe`` centroids
    nearest to the query.

    ``index`` is the prebuilt (assignments, centroids) pair from
    ``ivf_build``/``train_centroids`` — pass it so searches never
    re-cluster. When omitted (demo/test convenience) a Lloyd's-trained
    index is built on the fly. Recall vs brute force is measured in tests.
    """
    if index is None:
        cents = train_centroids(
            embeddings, n_centroids, dim=dim, id_col=id_col, vec_col=vec_col
        )
        index = (ivf_build(embeddings, cents, dim, id_col, vec_col), cents)
    assign, centroids = index
    q = embeddings.filter(F.col(id_col) == query_id).selectExpr(
        f"CAST({vec_col} AS ARRAY<DOUBLE>) AS qv", f"{id_col} AS __qid"
    )
    probe = (
        bcast_attach(centroids, q, "centroid_id", "__qid")
        .selectExpr("centroid_id", f"{dist2_unrolled('qv', 'centroid', dim)} AS d2")
        .orderBy("d2", "centroid_id")
        .limit(n_probe)
        .select("centroid_id")
    )
    cand_ids = assign.join(F.broadcast(probe), "centroid_id").select(id_col)
    cand = embeddings.join(cand_ids, id_col, "left_semi").filter(
        F.col(id_col) != query_id
    )
    scored = bcast_attach(cand, q, id_col, "__qid").selectExpr(
        id_col, f"{cosine_expr(vec_col, 'qv')} AS cosine"
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def ivf_write_index(
    embeddings: DataFrame,
    centroids: DataFrame,
    base_dir: str,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF index in the 100-TB layout the ``ivf_build``
    docstring promises: vectors co-located with their assignment, written
    under ``base_dir/ivf`` PARTITIONED BY ``centroid_id`` (one directory
    per cell), with the coarse quantizer under ``base_dir/centroids``.

    A probe then reads only the ``n_probe`` probed cell directories —
    partition pruning at the file-listing level, so search cost scales
    with cell size, not corpus size (see :func:`ivf_topk_persisted` and
    the pruned-scan assert in tests/test_plan_quality.py).
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..sources.sink import write_full_refresh

    import os as _os

    emb = embeddings.selectExpr(id_col, f"CAST({vec_col} AS ARRAY<DOUBLE>) AS v")
    rows = _assign_to(emb, centroids, dim, id_col).select(
        id_col, F.col("v").alias(vec_col), "centroid_id"
    )
    # the two writes are independent — overlap them (guide §2.6, the
    # pq_write_index pattern: the small centroids write back-fills the
    # partitioned write's task tail)
    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [
            pool.submit(
                write_full_refresh,
                rows,
                _os.path.join(base_dir, "ivf"),
                ["centroid_id"],
            ),
            pool.submit(
                write_full_refresh,
                centroids,
                _os.path.join(base_dir, "centroids"),
            ),
        ]
        for f in futs:
            f.result()


def append_ivf_index(
    embeddings: DataFrame,
    base_dir: str,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_target_mb: int | None = None,
) -> None:
    """Fold a NEW vector batch into the persisted IVF index — the ANN
    sibling of dedup.py's append_substring_index / append_minhash_index
    maintenance steps. Each batch vector is assigned to its nearest
    centroid from the STORED coarse quantizer (an append never retrains
    the quantizer — the standard IVF serving contract; retrain offline
    and rebuild when drift accumulates) and the (vector, centroid_id)
    rows land in the partitioned cell directories as ONE job-atomic
    parquet append: readers see the old index until the job commits, the
    stored vectors are never read, so the append costs O(batch). The
    append is repartitioned BY THE PARTITION COLUMN first (one file per
    touched cell per append — the round-9 partitioned-write rule); pass
    ``compact_target_mb`` every N appends to bin-pack cell directories
    through the rename-aside swap."""
    import os as _os

    spark = embeddings.sparkSession
    cents = spark.read.parquet(_os.path.join(base_dir, "centroids"))
    emb = embeddings.selectExpr(
        id_col, f"CAST({vec_col} AS ARRAY<DOUBLE>) AS v"
    )
    rows = _assign_to(emb, cents, dim, id_col).select(
        id_col, F.col("v").alias(vec_col), "centroid_id"
    )
    rows.repartition("centroid_id").write.mode("append").partitionBy(
        "centroid_id"
    ).parquet(_os.path.join(base_dir, "ivf"))
    if compact_target_mb is not None:
        from ..sources.sink import compact_small_files

        compact_small_files(
            spark,
            _os.path.join(base_dir, "ivf"),
            compact_target_mb,
            ["centroid_id"],
        )


def probe_cells(
    spark,
    base_dir: str,
    query_vec: list[float],
    n_probe: int = 4,
) -> list[int]:
    """Driver-side probe-cell selection over the persisted coarse
    quantizer. The centroid table is index METADATA — sized by design to
    fit in serving memory (even 65k cells × 64 dims ≈ 32 MB), never
    scaling with the corpus — so computing the ``n_probe`` nearest cells
    on the driver is the standard ANN serving shape, not a collect()-of-
    data antipattern. The distance is the same left-associative
    sequential fold as ``dist2_unrolled`` (Python float64 ops in the same
    order → bit-identical ranking to the Spark/DuckDB plans)."""
    cents = spark.read.parquet(f"{base_dir}/centroids").collect()
    scored = []
    for row in cents:
        d2 = 0.0
        for x, c in zip(query_vec, row.centroid):
            d2 += (float(x) - float(c)) * (float(x) - float(c))
        scored.append((d2, int(row.centroid_id)))
    scored.sort()
    return [cid for _, cid in scored[:n_probe]]


def ivf_topk_persisted(
    spark,
    base_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search against the WRITTEN index: a static ``isin`` filter on
    the partition column makes Catalyst prune the scan to the probed cell
    directories before any file is opened (PartitionFilters in the plan;
    asserted by tests/test_plan_quality.py). Only the probed cells'
    vectors are read, scored with the codegen'd cosine, and top-k'd."""
    cells = probe_cells(spark, base_dir, query_vec, n_probe)
    ivf = spark.read.parquet(f"{base_dir}/ivf").filter(
        F.col("centroid_id").isin(cells)
    )
    if exclude_id is not None:
        ivf = ivf.filter(F.col(id_col) != exclude_id)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = ivf.withColumn("__qv", q).selectExpr(
        id_col, f"{cosine_expr(vec_col, '__qv')} AS cosine"
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.35,
    n_planes: int = 8,
    probe_radius: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup use of similarity:
    emit (a, b, cosine) for all pairs with cosine >= threshold).

    Candidates come from the cheap SRP bucket codes — pairs whose codes
    differ in more than ``probe_radius`` of ``n_planes`` sign bits are
    skipped before any 64-dim arithmetic; survivors get the exact cosine.

    Candidate generation is BANDED like simhash_neardup_pairs: the code
    splits into ``n_bands`` fragments, and since a pair within Hamming
    distance r has SOME band differing by <= floor(r / n_bands) bits
    (pigeonhole on the distance, not the bits), each band side multi-probes
    its <=floor(r/n_bands)-bit mask neighborhood and equi-joins on the
    (band, probed-fragment) key — 2×5 = 10× fan-out for the 8-bit/r=3
    default vs 93× for whole-code mask probing. Band matches are a
    superset, so an exact code-Hamming verify runs before any vector
    attaches. At corpus scale the knob is ``n_planes`` (wider codes →
    more distinct band keys → sparser buckets); the join stays the same
    shape.
    """
    # materialize codes + pre-cast vectors + per-row norms once; the
    # self-join would otherwise recompute these projections per PAIR
    b = (
        lsh_buckets(embeddings, dim=dim, n_planes=n_planes, id_col=id_col, vec_col=vec_col)
        .selectExpr(id_col, f"CAST({vec_col} AS ARRAY<DOUBLE>) AS v", "bucket")
        .selectExpr(id_col, "v", "bucket", f"sqrt({dot_unrolled('v', 'v', dim)}) AS nrm")
        .localCheckpoint()
    )
    # banded multi-probe candidate generation. Pair generation carries
    # ONLY (id, code): exploding the 64-double vectors through the probe
    # fan-out would multiply the shuffle ~10×; vectors re-attach
    # afterwards via two SHUFFLE hash joins on id — the vector table is
    # the full corpus, never broadcast it.
    n_bands = 2
    band_bits = n_planes // n_bands
    band_mask = (1 << band_bits) - 1
    pb_radius = probe_radius // n_bands
    pmasks = [m for m in range(1 << band_bits) if bin(m).count("1") <= pb_radius]
    codes = b.selectExpr(id_col, "bucket")

    def _band_long(frame, id_alias, code_alias, probe):
        out = None
        for band in range(n_bands):
            frag = f"((bucket >> {band * band_bits}) & {band_mask})"
            if probe:
                part = frame.selectExpr(
                    f"{id_col} AS {id_alias}",
                    f"bucket AS {code_alias}",
                    f"{band} AS __band",
                    f"explode(array({', '.join(str(m) for m in pmasks)})) AS __mask",
                    f"{frag} AS __frag",
                ).selectExpr(
                    id_alias, code_alias, "__band", "(__frag ^ __mask) AS __bkey"
                )
            else:
                part = frame.selectExpr(
                    f"{id_col} AS {id_alias}",
                    f"bucket AS {code_alias}",
                    f"{band} AS __band",
                    f"{frag} AS __bkey",
                )
            out = part if out is None else out.unionByName(part)
        return out

    left = _band_long(codes, "id_a", "code_a", probe=True)
    right = _band_long(codes, "id_b", "code_b", probe=False)
    # dedup WITHOUT a shuffle: within one band a pair matches exactly one
    # probe mask (the mask equals the fragment xor), so duplicates only
    # arise across bands — keep the FIRST matching band's row (band j
    # matched and every earlier band's fragment differs by more than the
    # per-band probe radius), a pure predicate instead of a distinct()
    first_band = " OR ".join(
        "(__band = {b}{earlier})".format(
            b=band,
            earlier="".join(
                f" AND bit_count((code_a ^ code_b) & {band_mask << (j * band_bits)})"
                f" > {pb_radius}"
                for j in range(band)
            ),
        )
        for band in range(n_bands)
    )
    pairs = (
        left.join(right, ["__band", "__bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.expr(first_band))
        # verify the EXACT code Hamming before any vector arithmetic
        .filter(F.expr(f"{hamming_expr('code_a', 'code_b')} <= {probe_radius}"))
        .select("id_a", "id_b")
    )
    va = b.selectExpr(f"{id_col} AS id_a", "v AS v_a", "nrm AS n_a")
    vb = b.selectExpr(f"{id_col} AS id_b", "v AS v_b", "nrm AS n_b")
    cand = pairs.join(va, "id_a").join(vb, "id_b")
    scored = cand.selectExpr(
        "id_a",
        "id_b",
        f"({dot_unrolled('v_a', 'v_b', dim)}) / nullif(n_a * n_b, 0.0D) AS cosine",
    )
    return scored.filter(F.col("cosine") >= F.lit(threshold))


def semdedup_prune(
    embeddings: DataFrame,
    n_centroids: int | None = None,
    tau: float = 0.35,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cell: int = 256,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus embeddings with a coarse
    quantizer, compare pairs only WITHIN a cluster, and drop every vector
    that has a same-cluster neighbor with cosine >= ``tau`` and a smaller
    id (greedy keep-first, matching the repo-wide dedup convention).
    Returns the surviving (id, centroid_id) rows.

    This is the embedding-space sibling of ``exact_dedup``/MinHash: near-
    duplicate *semantics* (paraphrases, templated rewrites) that no
    lexical fingerprint catches. The clustering is what makes it scale:
    pairwise cosine is quadratic, but only within a cell, so the corpus-
    level cost is sum(|cell|^2) — the pair join is an equi-join on
    centroid_id that AQE can split per cell; nothing is ever broadcast
    except the centroid table.

    ``n_centroids`` defaults to a CORPUS-DERIVED value, ceil(N /
    ``target_cell``) floored at 16 — NOTE this default runs an EAGER
    count() action at plan-CONSTRUCTION time (like the localCheckpoint
    convention: fine inside registry carriers / terminal pipelines, never
    construct such a frame speculatively or in a plan-only test; pin
    ``n_centroids`` there) — so expected cell size — and with it the within-cell pairwise
    work per cell — stays bounded as the corpus grows instead of going
    quadratic at a fixed K. The cap at 4096 bounds the OTHER quadratic
    term: nearest-centroid assignment fans out N×K rows, so K must not
    itself track N unboundedly — beyond the cap (N ≳ 1M vectors at the
    default cell), pass a pre-trained persisted quantizer
    (``train_centroids`` + the partitioned IVF path) instead of seeding
    per query, as the SemDeDup paper does (50k faiss clusters for
    LAION). Callers needing bit-stable output across corpus sizes (the
    graded carrier) pin ``n_centroids`` explicitly — the centroid count
    changes cluster assignment and therefore which neighbor pairs are
    compared.

    ``centroids`` is the pre-trained PERSISTED quantizer path past the
    4096 cap: pass a (centroid_id, centroid) table — typically
    ``train_centroids`` output written once with the IVF index machinery
    and read back — and both ``n_centroids`` and the per-query seeding
    are bypassed entirely. The assignment is a pure function of the
    quantizer (broadcast join + deterministic tiebreak), so the same
    stored centroid table always reproduces the identical prune set —
    the reuse-equivalence contract tests/test_round9_ops.py pins.

    Oracle-parity: assignment ranks by the shared unrolled dist2 chain
    (bit-identical in DuckDB), the cosine is the same left-associative
    unrolled dot over materialized per-row norms, and the output carries
    ids only — no floating value crosses the driver boundary.
    """
    if centroids is not None:
        cents = centroids.select("centroid_id", "centroid")
    else:
        if n_centroids is None:
            n = embeddings.count()
            n_centroids = min(4096, max(16, -(-n // target_cell)))
        cents = seed_centroids(embeddings, n_centroids, id_col, vec_col)
    emb = embeddings.selectExpr(
        id_col, f"CAST({vec_col} AS ARRAY<DOUBLE>) AS v"
    )
    # materialize assignment + per-row norm once: the self-join below
    # would otherwise recompute the 16-way assignment window per PAIR
    w = (
        _assign_to(spread(emb), cents, dim, id_col)
        .selectExpr(
            id_col,
            "v",
            "centroid_id",
            f"sqrt({dot_unrolled('v', 'v', dim)}) AS nrm",
        )
        .localCheckpoint()
    )
    a = w.selectExpr(f"{id_col} AS id_a", "v AS v_a", "centroid_id", "nrm AS n_a")
    b = w.selectExpr(f"{id_col} AS id_b", "v AS v_b", "centroid_id", "nrm AS n_b")
    dups = (
        a.join(b, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .selectExpr(
            "id_b",
            f"({dot_unrolled('v_a', 'v_b', dim)}) / nullif(n_a * n_b, 0.0D) AS cos",
        )
        .filter(F.col("cos") >= F.lit(tau))
        .select("id_b")
        .distinct()
    )
    return (
        w.join(dups, w[id_col] == dups["id_b"], "left_anti")
        .select(id_col, "centroid_id")
    )


def split_leakage_pairs(
    embeddings: DataFrame,
    train_pct: int = 90,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train/test leakage detection in EMBEDDING space: near-duplicate
    pairs that straddle the deterministic dataset split — the semantic
    sibling of lexical benchmark decontamination
    (quality.contamination_pairs). A test document whose paraphrase sits
    in train inflates eval scores without sharing a single n-gram; the
    embedding near-dup pairs catch exactly that class.

    Split assignment is the same md5-bucket function dataset_split uses
    (pure function of the id — re-runs always agree); candidates come
    from the banded SRP pipeline (embedding_neardup_pairs), so the
    corpus-scale cost profile is identical to the dedup pass — one more
    tiny id-keyed join per side to attach the split labels.

    Output: (id_a, id_b, split_a, split_b, cosine), only rows where the
    splits differ.
    """
    from ..functions import text as T

    split = (
        f"CASE WHEN {T.hexint(f'CAST({id_col} AS STRING)', S)} % 100 "
        f"< {train_pct} THEN 'train' ELSE 'test' END"
    )
    labels = embeddings.selectExpr(id_col, f"{split} AS split")
    pairs = embedding_neardup_pairs(
        embeddings, threshold=threshold, id_col=id_col, vec_col=vec_col
    )
    la = labels.selectExpr(f"{id_col} AS id_a", "split AS split_a")
    lb = labels.selectExpr(f"{id_col} AS id_b", "split AS split_b")
    return (
        pairs.join(la, "id_a")
        .join(lb, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b", "cosine")
    )


# --- SQ8 scalar quantization (compressed-domain search) ---------------------


def _el(vec: str, i: int, d: str = S) -> str:
    """1-indexed element access in either dialect."""
    return f"element_at({vec}, {i})" if d == S else f"{vec}[{i}]"


def sq8_range_exprs(vec: str, dim: int, d: str = S) -> tuple[str, str]:
    """Per-row (min, max) over the vector as flat least/greatest chains
    (codegen'd in Spark; identical semantics in DuckDB)."""
    els = ", ".join(_el(vec, i, d) for i in range(1, dim + 1))
    return f"least({els})", f"greatest({els})"


def sq8_code_expr(
    vec: str, dim: int, d: str = S, lo: str = "__lo", hi: str = "__hi"
) -> str:
    """8-bit code array: c_i = clamp(floor((x_i - lo) * 255 / (hi - lo))).

    Every term is the SAME left-associative IEEE expression in both
    dialects — subtraction, multiplication and division are correctly
    rounded, so the doubles (and hence floor and the final integer codes)
    are bit-identical across engines. ``lo`` / ``hi`` default to the
    global training range columns (attached 1-row frame / CTE); callers
    on the literal-range serving path pass exact double literals
    (``_dlit``) instead — same IEEE ops on the same operands, so the
    codes stay bit-identical. nullif guards a degenerate constant corpus
    (NULL codes rather than an ANSI abort).
    """
    z, m = ("0.0D", "255.0D") if d == S else ("0.0", "255.0")
    codes = ", ".join(
        f"CAST(least({m}, greatest({z}, floor((({_el(vec, i, d)} - {lo}) * {m})"
        f" / nullif({hi} - {lo}, {z})))) AS INT)"
        for i in range(1, dim + 1)
    )
    return f"array({codes})" if d == S else f"[{codes}]"


def sq8_dist2_expr(a: str, b: str, dim: int, d: str = S) -> str:
    """Squared L2 distance between two code arrays — pure integer
    arithmetic (max 64 * 255^2 < 2^23), exactly comparable across engines
    with no floating-point ordering concerns at all."""
    terms = " + ".join(
        f"(({_el(a, i, d)} - {_el(b, i, d)}) * ({_el(a, i, d)} - {_el(b, i, d)}))"
        for i in range(1, dim + 1)
    )
    return f"CAST({terms} AS BIGINT)"


def sq8_codes(
    embeddings: DataFrame,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, v, c): float vectors plus their trained 8-bit codes.

    The quantizer is a single global [lo, hi] range (one MIN/MAX
    aggregate, broadcast back) rather than FAISS-style per-dimension
    ranges: a uniform scale factors out of the distance, which keeps the
    compressed-domain comparison EXACT INTEGER — fully oracle-checkable —
    where per-dim scales would reintroduce per-term double weights.

    Scale posture: codes are 1/4 the bytes of the float32 vectors (1/8 of
    the cast doubles) and are the ONLY thing the candidate stage shuffles
    or scans; at rest they pack into a dim-byte BINARY column. The range
    aggregate is map-side combined (two doubles per partition cross the
    wire) and at 100 TB is trained once on a sample and stored as index
    metadata, not recomputed per query.
    """
    emb = spread(embeddings).selectExpr(
        id_col, f"CAST({vec_col} AS ARRAY<DOUBLE>) AS v"
    )
    rmin, rmax = sq8_range_exprs("v", dim)
    rng = emb.selectExpr(f"{rmin} AS __rmin", f"{rmax} AS __rmax").agg(
        F.min("__rmin").alias("__lo"), F.max("__rmax").alias("__hi")
    )
    return bcast_attach(emb, rng, id_col, "__lo").selectExpr(
        id_col, "v", f"{sq8_code_expr('v', dim)} AS c"
    )


def _dlit(x: float) -> str:
    """Exact double literal: ``repr()`` is the shortest round-trip decimal
    and Java's ``Double.parseDouble`` is correctly rounded, so the planned
    constant is bit-identical to the collected value. Constant-folded at
    plan time (no per-row parse)."""
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def collect_sq8_range(
    embeddings: DataFrame, dim: int = 64, vec_col: str = "embedding"
) -> tuple[float, float]:
    """Driver-side SQ8 training range — TWO doubles of quantizer metadata
    (the serving-shape exception, like ``probe_cells``): the same MIN/MAX
    aggregate ``sq8_codes`` broadcasts, collected instead so quantization
    becomes a literal-range flat projection (no 1-row attach join, no
    checkpoint barrier, no BuildRight exchange). Raises on an empty or
    constant corpus — the same contract ``_py_sq8_codes`` already
    enforces on the persisted serving path."""
    emb = embeddings.selectExpr(f"CAST({vec_col} AS ARRAY<DOUBLE>) AS v")
    rmin, rmax = sq8_range_exprs("v", dim)
    row = (
        emb.selectExpr(f"{rmin} AS __rmin", f"{rmax} AS __rmax")
        .agg(F.min("__rmin").alias("lo"), F.max("__rmax").alias("hi"))
        .head()
    )
    if row is None or row["lo"] is None or row["lo"] == row["hi"]:
        raise ValueError("SQ8 range: empty or constant corpus")
    return float(row["lo"]), float(row["hi"])


def _collect_query_vec(
    embeddings: DataFrame, query_id: int, id_col: str, vec_col: str
) -> list[float]:
    """One query vector, driver-side (serving-shape metadata: the query
    is the search INPUT, never corpus data)."""
    row = (
        embeddings.filter(F.col(id_col) == query_id)
        .selectExpr(f"CAST({vec_col} AS ARRAY<DOUBLE>) AS v")
        .head()
    )
    if row is None:
        raise ValueError(f"query vector {query_id} not found")
    return [float(x) for x in row["v"]]


def sq8_topk(
    embeddings: DataFrame,
    query_id: int = 0,
    k: int = 10,
    rerank: int = 40,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage compressed-domain search (the classic SQ8 ANN shape):

    1. candidate generation ranks the corpus by integer squared distance
       between 8-bit codes (``rerank`` survivors; deterministic
       (d2, id) total order), touching only the compact codes;
    2. exact cosine rerank on the float vectors of the survivors
       (the bit-identical sequential fold), top-k.

    Recall vs brute force is measured in tests; the dial is ``rerank``.

    Plan shape (optimization r12): the training range and the query codes
    are collected driver-side (quantizer metadata — the serving-shape
    exception), so the whole candidate stage is ONE scan → quantize
    projection → flat integer d2 vs literal query codes → TakeOrdered.
    Zero joins, zero shuffles, zero checkpoint jobs — where the previous
    shape paid a range-attach broadcast, an eager codes checkpoint and a
    query-row broadcast join. CollapseProject's duplication guard keeps
    the quantize projection separate from the 64-reference d2 consumer
    (both pipeline in one WholeStageCodegen stage), so codes are computed
    once per row without a materialization barrier. The survivors carry
    ``v`` through the bounded TakeOrdered heap, so the rerank needs no
    second corpus scan. Bit-parity: same IEEE quantization on the same
    operands, exact integer d2, same (d2, id) total order.
    """
    lo, hi = collect_sq8_range(embeddings, dim, vec_col)
    qv = _collect_query_vec(embeddings, query_id, id_col, vec_col)
    qc = _py_sq8_codes(qv, lo, hi)
    code = sq8_code_expr("v", dim, lo=_dlit(lo), hi=_dlit(hi))
    d2 = " + ".join(
        f"((element_at(c, {i}) - {qc[i - 1]}) * (element_at(c, {i}) - {qc[i - 1]}))"
        for i in range(1, dim + 1)
    )
    cand = (
        spread(embeddings)
        .filter(F.col(id_col) != query_id)
        .selectExpr(id_col, f"CAST({vec_col} AS ARRAY<DOUBLE>) AS v")
        .selectExpr(id_col, "v", f"{code} AS c")
        .selectExpr(id_col, "v", f"CAST({d2} AS BIGINT) AS d2")
        .orderBy("d2", id_col)
        .limit(rerank)
    )
    scored = cand.withColumn(
        "__qv", F.array(*[F.lit(x) for x in qv])
    ).selectExpr(id_col, f"{cosine_expr('v', '__qv')} AS cosine")
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)

# --- PQ (product quantization / ADC compressed-domain search) ---------------
#
# Completes the compressed-domain family after SQ8 (global-range scalar
# codes): PQ splits each vector into M subvectors and replaces every
# subvector with the id of its nearest entry in a per-subspace codebook,
# so a vector costs M small ints at rest and the query-time distance is
# an ADC (asymmetric distance computation) TABLE LOOKUP — the classic
# Jegou/Douze/Schmid 2011 design. Everything here is exact integer
# arithmetic over the SQ8 integer codes (subvector slices of the same
# bit-identical code arrays the sq8_topk oracle checks), so assignment,
# the lookup table, and the candidate cut are all fully oracle-checkable:
# the seeded codebook (first n_codes vectors by id, like seed_centroids)
# is the registered-query quantizer; a k-means-trained codebook is the
# offline quality upgrade, exactly as train_centroids is for IVF.
#
# Scale posture: codes at rest are M bytes/vector (8 here vs 64 for SQ8,
# 256 for float32) — the candidate stage scans and shuffles ONLY them.
# The ADC lookup table is M x n_codes integers built from the query
# alone (128 values), broadcast; candidate scoring is one broadcast
# hash join + an integer sum — no floats until the ``rerank``-row exact
# cosine stage. At 100 TB the assignment table is a written index
# (like ivf_write_index), not a per-query derivation.


def pq_sub_expr(codes: str, m: str, sub_dim: int, d: str = S) -> str:
    """Subvector ``m`` (0-based expression) of a flat SQ8 code array —
    a 1-based ``sub_dim``-wide slice, dialect-paired."""
    return T.aslice(codes, f"(({m}) * {sub_dim} + 1)", sub_dim, d)


def pq_codebook(
    codes: DataFrame,
    n_codes: int = 16,
    m_sub: int = 8,
    sub_dim: int = 8,
    id_col: str = "vec_id",
) -> DataFrame:
    """(m, code_id, entry): per-subspace integer codebooks seeded from the
    first ``n_codes`` vectors by id (dense code_id 0..n-1). ``codes`` is
    an sq8_codes frame (id, v, c). m_sub * n_codes rows — broadcast-sized
    at any corpus scale (the codebook is a model, not data)."""
    seeds = (
        codes.orderBy(id_col)
        .limit(n_codes)
        .withColumn(
            "code_id",
            (F.row_number().over(Window.orderBy(id_col)) - 1).cast("int"),
        )
    )
    return seeds.selectExpr(
        "code_id", f"explode(sequence(0, {m_sub - 1})) AS m", "c"
    ).selectExpr(
        "m", "code_id", f"{pq_sub_expr('c', 'm', sub_dim)} AS entry"
    )


def pq_assign(
    codes: DataFrame,
    book: DataFrame,
    m_sub: int = 8,
    sub_dim: int = 8,
    id_col: str = "vec_id",
    n_codes: int = 32,
) -> DataFrame:
    """(id, m, code_id): nearest codebook entry per (vector, subspace) by
    exact integer squared distance, code_id tiebreak. The argmin is a
    reducible aggregate (round-5 keep-first rule — map-side combine
    reduces each vector's n_codes candidates before the exchange), never
    a row_number window; and because BOTH components are bounded
    non-negative integers (d2 <= sub_dim * 255², code_id < n_codes) the
    (d2, code_id) lexicographic struct order is encoded losslessly into
    ONE bigint ``d2 * n_codes + code_id`` — min(bigint) HASH-aggregates
    where min(struct) planned as a partial+final SortAggregate sorting
    the full |vectors| x m_sub x n_codes candidate fan-out by group key
    (optimization r12, guide §2.4/§2.3: same exchange, narrower rows,
    no per-partition sort). The winner is bit-identical: the encoding is
    a strictly order-preserving bijection on the candidate set.
    ``n_codes`` only needs to exceed every code_id (codebook ids are
    dense 0..n_codes-1 by construction)."""
    scored = _pq_scored(codes, book, m_sub, sub_dim, id_col, n_codes)
    enc = int(n_codes)
    return (
        scored.groupBy(id_col, "m")
        .agg(F.min("__e").alias("__e"))
        .selectExpr(id_col, "m", f"CAST(__e % {enc} AS INT) AS code_id")
    )


def _pq_scored(
    codes: DataFrame,
    book: DataFrame,
    m_sub: int,
    sub_dim: int,
    id_col: str,
    n_codes: int,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, m, __e): every (vector, subspace, codebook entry) candidate,
    encoded as the order-preserving bigint d2 * n_codes + code_id (see
    :func:`pq_assign`). Shared by the long-format argmin and the packed
    per-vector array form. ``carry`` columns pass through unchanged."""
    subs = codes.selectExpr(
        id_col, f"explode(sequence(0, {m_sub - 1})) AS m", "c", *carry
    ).selectExpr(
        id_col, "m", f"{pq_sub_expr('c', 'm', sub_dim)} AS sub", *carry
    )
    return subs.join(F.broadcast(book), "m").selectExpr(
        id_col,
        "m",
        f"CAST({sq8_dist2_expr('sub', 'entry', sub_dim)} AS BIGINT)"
        f" * {int(n_codes)} + code_id AS __e",
        *carry,
    )


def pq_assign_packed(
    codes: DataFrame,
    book: DataFrame,
    m_sub: int = 8,
    sub_dim: int = 8,
    id_col: str = "vec_id",
    n_codes: int = 32,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, code int[m_sub]): the per-vector PQ code ARRAY — the storage
    layout :func:`pq_write_index` persists. One hash aggregate keyed by
    id with ``m_sub`` conditional min(bigint) columns replaces the
    (id, m) argmin + a second id-keyed collect_list/array_sort regroup
    (optimization r12, guide §2.4: one exchange instead of two, and no
    per-row sort/lambda in the regroup). Identical to packing
    :func:`pq_assign` by construction: min(CASE WHEN m=j ...) over the
    id group IS the (id, j) argmin.

    ``carry`` columns ride through the aggregate via first() — constant
    within each id's fan-out rows (the _assign_to convention), so no
    second id-keyed join is needed to re-attach them (optimization
    r13)."""
    scored = _pq_scored(codes, book, m_sub, sub_dim, id_col, n_codes, carry)
    enc = int(n_codes)
    packed = scored.groupBy(id_col).agg(
        *[
            F.min(F.expr(f"CASE WHEN m = {j} THEN __e END")).alias(f"__e{j}")
            for j in range(m_sub)
        ],
        *[F.first(c).alias(c) for c in carry],
    )
    arr = ", ".join(f"CAST(__e{j} % {enc} AS INT)" for j in range(m_sub))
    return packed.selectExpr(id_col, f"array({arr}) AS code", *carry)


def _pq_query_metadata(
    embeddings: DataFrame,
    query_id: int,
    dim: int,
    m_sub: int,
    id_col: str,
    vec_col: str,
) -> tuple[float, float, list[float], list[list[int]]]:
    """(lo, hi, query vector, per-subspace query code slices) — the
    driver-side quantizer/query metadata of a PQ search (the serving-
    shape exception: two doubles + one vector, exactly what the
    persisted probe already reads from the stored index). The query
    codes are bit-identical to the engine-quantized ones
    (``_py_sq8_codes``)."""
    sub_dim = dim // m_sub
    rmin, rmax = sq8_range_exprs("v", dim)
    row = (
        embeddings.selectExpr(
            f"CAST({vec_col} AS ARRAY<DOUBLE>) AS v", id_col
        )
        .selectExpr(
            f"{rmin} AS __rmin",
            f"{rmax} AS __rmax",
            f"CASE WHEN {id_col} = {int(query_id)} THEN v END AS __qv",
        )
        .agg(
            F.min("__rmin").alias("lo"),
            F.max("__rmax").alias("hi"),
            # exactly one row is non-null, so first(ignorenulls) is
            # deterministic regardless of combine order
            F.first("__qv", ignorenulls=True).alias("qv"),
        )
        .head()
    )
    if row is None or row["lo"] is None or row["lo"] == row["hi"]:
        raise ValueError("SQ8 range: empty or constant corpus")
    if row["qv"] is None:
        raise ValueError(f"query vector {query_id} not found")
    lo, hi = float(row["lo"]), float(row["hi"])
    qv = [float(x) for x in row["qv"]]
    qc = _py_sq8_codes(qv, lo, hi)
    qsubs = [qc[m * sub_dim : (m + 1) * sub_dim] for m in range(m_sub)]
    return lo, hi, qv, qsubs


def _pq_sub_explode(
    emb: DataFrame,
    dim: int,
    m_sub: int,
    lo: float,
    hi: float,
    id_col: str,
) -> DataFrame:
    """(id, m, sub): per-subspace SQ8 code slices, quantized INLINE with
    the literal training range — one projection per row (each of the
    ``dim`` code terms appears exactly once, built directly into its
    subspace array, so CollapseProject cannot duplicate the quantization
    per consumer), then a posexplode to the (id, m) grain. Replaces the
    eager full-corpus codes checkpoint + slice-of-c derivation
    (optimization r13, guide §2.4: the checkpoint job disappears and the
    scan quantizes only the rows that reach it). Input ``emb`` must
    carry a pre-cast ``v`` array<double>."""
    sub_dim = dim // m_sub
    subs = []
    for m in range(m_sub):
        els = ", ".join(
            f"CAST(least(255.0D, greatest(0.0D, floor(((element_at(v, {i})"
            f" - {_dlit(lo)}) * 255.0D)"
            f" / nullif({_dlit(hi)} - {_dlit(lo)}, 0.0D)))) AS INT)"
            for i in range(m * sub_dim + 1, (m + 1) * sub_dim + 1)
        )
        subs.append(f"array({els})")
    return emb.selectExpr(
        id_col, f"posexplode(array({', '.join(subs)})) AS (m, sub)"
    )


def pq_topk(
    embeddings: DataFrame,
    query_id: int = 0,
    k: int = 10,
    rerank: int = 80,
    dim: int = 64,
    m_sub: int = 8,
    n_codes: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage PQ/ADC search:

    1. candidate generation ranks the corpus by the ADC distance — the
       integer sum over subspaces of d2(query subvector, assigned
       codebook entry), computed as a broadcast lookup-table join on
       (m, code_id) (the LUT is built from the query alone:
       m_sub x n_codes integers); ``rerank`` survivors under the
       deterministic (adc_d2, id) total order;
    2. exact cosine rerank on the float vectors of the survivors, top-k.

    Returns (id, adc_d2, cosine) — the compressed-domain distance rides
    along for calibration. Recall vs brute force is measured in tests;
    the dials are ``rerank`` and ``n_codes``.

    Plan shape: the eager codes checkpoint is KEPT on purpose
    (optimization r13 negative result, interleaved A/B in
    plans/r13/ab_cur_embedding_pq_topk_vs_old_embedding_pq_topk.txt):
    the full corpus must be quantized here regardless (assignment scores
    every vector), so the checkpoint amortizes ONE quantization across
    its four consumers (book, assignment, query subvectors, rerank),
    while the driver-metadata/literal-range form that wins for
    ivfpq_topk re-derived it per consumer with extra scans and
    exchanges — measured ~30% slower pairwise. The metadata form pays
    exactly where it SHRINKS the quantized set (ivfpq's probed-cell
    slice) or removes a disk round-trip (pq_write_index).
    """
    sub_dim = dim // m_sub
    # materialize the codes ONCE (the sq8_topk lesson): the codebook, the
    # assignment, the query subvectors and the rerank vectors all read
    # this frame — uncheckpointed, Catalyst would re-inline the 64-term
    # quantization array per consumer.
    codes = sq8_codes(embeddings, dim, id_col, vec_col).localCheckpoint()
    book = pq_codebook(codes, n_codes, m_sub, sub_dim, id_col)
    assign = pq_assign(codes, book, m_sub, sub_dim, id_col, n_codes)
    qsubs = (
        codes.filter(F.col(id_col) == query_id)
        .selectExpr(f"explode(sequence(0, {m_sub - 1})) AS m", "c")
        .selectExpr("m", f"{pq_sub_expr('c', 'm', sub_dim)} AS qsub")
    )
    lut = book.join(F.broadcast(qsubs), "m").selectExpr(
        "m", "code_id", f"{sq8_dist2_expr('qsub', 'entry', sub_dim)} AS t"
    )
    adc = (
        assign.filter(F.col(id_col) != query_id)
        .join(F.broadcast(lut), ["m", "code_id"])
        .groupBy(id_col)
        .agg(F.sum("t").cast("bigint").alias("adc_d2"))
    )
    cand = adc.orderBy("adc_d2", id_col).limit(rerank)
    q = codes.filter(F.col(id_col) == query_id).selectExpr(
        "v AS qv", f"{id_col} AS __qid"
    )
    scored = bcast_attach(
        codes.join(F.broadcast(cand), id_col), q, id_col, "__qid"
    ).selectExpr(id_col, "adc_d2", f"{cosine_expr('v', 'qv')} AS cosine")
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def ivfpq_topk(
    embeddings: DataFrame,
    query_id: int = 0,
    k: int = 10,
    n_probe: int = 4,
    rerank: int = 80,
    dim: int = 64,
    m_sub: int = 8,
    n_codes: int = 32,
    n_centroids: int = 16,
    index: tuple[DataFrame, DataFrame] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the production ANN composition (FAISS's IndexIVFPQ shape)
    — the coarse quantizer restricts candidates to the ``n_probe``
    probed cells, ADC ranks ONLY those candidates in the compressed
    domain, exact cosine reranks the ``rerank`` survivors.

    Cost shape vs the flat variants: ivf_topk scores every probed-cell
    vector with the full 64-term float cosine; pq_topk ADC-scores the
    WHOLE corpus. Here the float arithmetic touches only the final
    ``rerank`` rows and the integer LUT join touches only ~N*n_probe/K
    candidate rows — at 100 TB both the cell membership and the PQ codes
    are written partitioned by centroid_id (ivf_write_index layout), so
    a probe is a pruned scan of n_probe directories of M-byte codes.

    Every stage is oracle-checkable: the cell cut is the bit-identical
    double d2 ranking (dist2_unrolled), the ADC cut exact integers, the
    rerank the bit-identical sequential cosine fold.
    """
    sub_dim = dim // m_sub
    if index is None:
        cents = seed_centroids(embeddings, n_centroids, id_col, vec_col)
        index = (ivf_build(embeddings, cents, dim, id_col, vec_col), cents)
    cell_of, centroids = index
    # driver-side quantizer/query metadata (optimization r13, the pq_topk
    # shape — see that docstring): no eager codes checkpoint, the query
    # vector/codes are literals, and candidate quantization happens
    # INSIDE the probed-cell slice only (guide §1.2).
    lo, hi, qv, qsubs = _pq_query_metadata(
        embeddings, query_id, dim, m_sub, id_col, vec_col
    )
    emb = spread(embeddings).selectExpr(
        id_col, f"CAST({vec_col} AS ARRAY<DOUBLE>) AS v"
    )
    # semi-join input deliberately NOT spread: the join's own hash
    # exchange already redistributes; a round-robin repartition ahead of
    # it is a second full shuffle for nothing
    emb_cand = embeddings.selectExpr(
        id_col, f"CAST({vec_col} AS ARRAY<DOUBLE>) AS v"
    )
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    probe = (
        centroids.withColumn("__qv", qlit)
        .selectExpr(
            "centroid_id", f"{dist2_unrolled('__qv', 'centroid', dim)} AS d2"
        )
        .orderBy("d2", "centroid_id")
        .limit(n_probe)
        .select("centroid_id")
    )
    cand_ids = (
        cell_of.join(F.broadcast(probe), "centroid_id")
        .filter(F.col(id_col) != query_id)
        .select(id_col)
    )
    # PQ-assign ONLY the probed-cell candidates (optimization r12, guide
    # §1.2 "don't compute things you throw away"): per-row assignment is
    # independent of every other row (the codebook is seeded corpus-wide,
    # NOT from the candidate slice), so restricting the input to the rows
    # the ADC aggregate keeps is bit-identical. The semi-join hash-
    # partitions the candidate subs by id, so the (id, m) argmin and the
    # per-id ADC sum reuse that one exchange.
    book = pq_codebook(
        emb.selectExpr(
            id_col, f"{sq8_code_expr('v', dim, lo=_dlit(lo), hi=_dlit(hi))} AS c"
        ),
        n_codes,
        m_sub,
        sub_dim,
        id_col,
    )
    # shuffled-hash semi-join (guide §3.1): the candidate-id build side
    # is a per-partition hash table, no sort on either side — sort-merge
    # would sort the corpus scan AND the id list for a membership probe.
    # Never broadcast: cand_ids is ~n_probe/K of the corpus, which at
    # 100 TB is not broadcastable.
    subs = _pq_sub_explode(
        emb_cand.join(cand_ids.hint("shuffle_hash"), id_col, "left_semi"),
        dim,
        m_sub,
        lo,
        hi,
        id_col,
    )
    scored = subs.join(F.broadcast(book), "m").selectExpr(
        id_col,
        "m",
        f"CAST({sq8_dist2_expr('sub', 'entry', sub_dim)} AS BIGINT)"
        f" * {int(n_codes)} + code_id AS __e",
    )
    pq = (
        scored.groupBy(id_col, "m")
        .agg(F.min("__e").alias("__e"))
        .selectExpr(id_col, "m", f"CAST(__e % {int(n_codes)} AS INT) AS code_id")
    )
    spark = embeddings.sparkSession
    qsub_df = spark.createDataFrame(
        [(m, qsubs[m]) for m in range(m_sub)], "m INT, qsub ARRAY<INT>"
    )
    lut = book.join(F.broadcast(qsub_df), "m").selectExpr(
        "m", "code_id", f"{sq8_dist2_expr('qsub', 'entry', sub_dim)} AS t"
    )
    adc = (
        pq.join(F.broadcast(lut), ["m", "code_id"])
        .groupBy(id_col)
        .agg(F.sum("t").cast("bigint").alias("adc_d2"))
    )
    cand = adc.orderBy("adc_d2", id_col).limit(rerank)
    scored2 = (
        emb.join(F.broadcast(cand), id_col)
        .withColumn("__qv", qlit)
        .selectExpr(id_col, "adc_d2", f"{cosine_expr('v', '__qv')} AS cosine")
    )
    return scored2.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def pq_write_index(
    embeddings: DataFrame,
    centroids: DataFrame,
    base_dir: str,
    dim: int = 64,
    m_sub: int = 8,
    n_codes: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the full IVF-PQ index — the on-disk FAISS-IVFPQ layout:

    - ``base_dir/ivf``       (vec_id, vector, centroid_id) partitioned by
                             centroid_id — the float vectors, co-located
                             with their cell (ivf_write_index layout);
    - ``base_dir/pq``        (vec_id, code int[m_sub], centroid_id)
                             partitioned by centroid_id — m_sub small
                             ints per vector, the ONLY thing an ADC probe
                             scans;
    - ``base_dir/codebook``  (m, code_id, entry int[sub_dim]) — the PQ
                             model, m_sub x n_codes rows;
    - ``base_dir/sq8_range`` 1-row (__lo, __hi) — the scalar quantizer
                             the codes were trained with (a probe must
                             quantize the query with the SAME range);
    - ``base_dir/centroids`` the coarse quantizer (probe_cells metadata).

    Both data tables repartition BY THE PARTITION COLUMN before the
    partitioned write (one file per cell per wave — the round-9 rule).

    Optimization r12: the five writes are independent once ``codes`` and
    ``cells`` are materialized (eager checkpoints), so they run
    OVERLAPPED from a small thread pool (guide §2.6 — the tail of one
    write's job backfills the next's task wave). The derivations
    themselves deliberately stay the engine-side join/aggregate shapes:
    inlining the full m_sub×n_codes codebook as literal d2 arrays puts
    ~2k terms in one WholeStageCodegen stage, Janino's 64 KB method
    limit kills codegen and the whole projection runs INTERPRETED —
    measured 4.2 s → 9.7 s on the persisted carrier before this was
    reverted (only the bounded query-side LUT of the serving probe is
    literal-safe, ivfpq_topk_persisted).
    """
    import os as _os
    from concurrent.futures import ThreadPoolExecutor

    from ..sources.sink import write_full_refresh

    sub_dim = dim // m_sub
    # Optimization r13 (guide §2.4/§1.2): the training range is collected
    # driver-side (two doubles — the same aggregate the old shape ran as
    # a per-write job; collected values are the exact doubles the stored
    # sq8_range row must hold), quantization + cell assignment fuse into
    # ONE materialization (was two eager checkpoints: a codes frame, then
    # a second _assign_to scan over it), and the packed PQ write carries
    # centroid_id through its aggregate instead of re-joining the cells
    # frame by id.
    lo, hi = collect_sq8_range(embeddings, dim, vec_col)
    emb = spread(embeddings).selectExpr(
        id_col, f"CAST({vec_col} AS ARRAY<DOUBLE>) AS v"
    )
    code = sq8_code_expr("v", dim, lo=_dlit(lo), hi=_dlit(hi))
    combined = _assign_to(
        emb.selectExpr(id_col, "v", f"{code} AS c"),
        centroids,
        dim,
        id_col,
        carry=("c",),
    ).localCheckpoint()
    book = pq_codebook(combined, n_codes, m_sub, sub_dim, id_col)
    pq_rows = pq_assign_packed(
        combined.select(id_col, "c", "centroid_id"),
        book,
        m_sub,
        sub_dim,
        id_col,
        n_codes,
        carry=("centroid_id",),
    )
    emb_rows = combined.select(
        id_col, F.col("v").alias(vec_col), "centroid_id"
    )
    spark = embeddings.sparkSession
    rng = spark.range(1).selectExpr(
        f"{_dlit(lo)} AS __lo", f"{_dlit(hi)} AS __hi"
    )
    writes = [
        lambda: write_full_refresh(
            emb_rows, _os.path.join(base_dir, "ivf"), ["centroid_id"]
        ),
        lambda: write_full_refresh(
            pq_rows, _os.path.join(base_dir, "pq"), ["centroid_id"]
        ),
        lambda: write_full_refresh(book, _os.path.join(base_dir, "codebook")),
        lambda: write_full_refresh(
            centroids, _os.path.join(base_dir, "centroids")
        ),
        lambda: write_full_refresh(rng, _os.path.join(base_dir, "sq8_range")),
    ]
    with ThreadPoolExecutor(max_workers=3) as pool:
        for fut in [pool.submit(w) for w in writes]:
            fut.result()


def _py_sq8_codes(vec: list[float], lo: float, hi: float) -> list[int]:
    """Driver-side SQ8 quantization of a query vector — the SAME
    left-associative IEEE ops as sq8_code_expr ((x - lo) * 255.0, then
    divide, floor, clamp), so the integer codes are bit-identical to the
    engine-quantized ones. Serving-shape metadata arithmetic, like
    probe_cells."""
    import math as _math

    out = []
    for x in vec:
        denom = hi - lo
        if denom == 0.0:
            raise ValueError("degenerate SQ8 range (constant corpus)")
        c = _math.floor(((float(x) - lo) * 255.0) / denom)
        out.append(int(min(255.0, max(0.0, c))))
    return out


def ivfpq_topk_persisted(
    spark,
    base_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    rerank: int = 80,
    m_sub: int = 8,
    n_codes: int = 32,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ search against the WRITTEN index — the serving path:

    1. probe-cell selection on the driver over the centroid metadata
       (probe_cells' contract; the coarse quantizer never scales with
       the corpus);
    2. the query is SQ8-quantized driver-side with the STORED range and
       the ADC lookup table (m_sub x n_codes exact integers) is computed
       from the stored codebook — pure metadata arithmetic;
    3. the ADC scan reads ONLY the probed cells of ``base_dir/pq``
       (static partition pruning on centroid_id) and scores each row
       with a FLAT codegen expression — the LUT is inlined as m_sub
       array literals, so candidate scoring is element_at lookups + an
       integer sum, no join, no shuffle before the rerank TakeOrdered;
    4. exact cosine rerank reads only the probed cells of
       ``base_dir/ivf`` (pruned again) joined to the ``rerank``
       surviving ids (broadcast).
    """
    import os as _os

    cells = probe_cells(spark, base_dir, query_vec, n_probe)
    rng = spark.read.parquet(_os.path.join(base_dir, "sq8_range")).head()
    qcodes = _py_sq8_codes([float(x) for x in query_vec], rng["__lo"], rng["__hi"])
    sub_dim = len(qcodes) // m_sub
    book = spark.read.parquet(_os.path.join(base_dir, "codebook")).collect()
    entries = {(r.m, r.code_id): list(r.entry) for r in book}
    lut = {}
    for (m, cid), entry in entries.items():
        qsub = qcodes[m * sub_dim : (m + 1) * sub_dim]
        lut[(m, cid)] = sum((a - b) * (a - b) for a, b in zip(qsub, entry))
    terms = []
    for m in range(m_sub):
        arr = ", ".join(str(lut[(m, j)]) for j in range(n_codes))
        terms.append(f"element_at(array({arr}), element_at(code, {m + 1}) + 1)")
    adc_expr = "CAST(" + " + ".join(terms) + " AS BIGINT)"
    pq = spark.read.parquet(_os.path.join(base_dir, "pq")).filter(
        F.col("centroid_id").isin(cells)
    )
    if exclude_id is not None:
        pq = pq.filter(F.col(id_col) != exclude_id)
    cand = (
        pq.selectExpr(id_col, f"{adc_expr} AS adc_d2")
        .orderBy("adc_d2", id_col)
        .limit(rerank)
    )
    vecs = spark.read.parquet(_os.path.join(base_dir, "ivf")).filter(
        F.col("centroid_id").isin(cells)
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = (
        vecs.join(F.broadcast(cand), id_col)
        .withColumn("__qv", q)
        .selectExpr(id_col, "adc_d2", f"{cosine_expr(vec_col, '__qv')} AS cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def hard_negative_mining(
    embeddings: DataFrame,
    n_queries: int = 20,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for embedding/contrastive training (FaceNet /
    DPR style): for each anchor (the first ``n_queries`` vectors), the
    top-``k`` most similar vectors with a DIFFERENT label — the negatives
    a trainer most needs — plus the anchor's best same-label similarity
    (its positive) and the margin ``pos_cosine − cosine`` (negatives with
    a small or negative margin are the semi-hard/hard band).

    Engine parity: cosines come from the sequential zip_with/aggregate
    fold that is bit-identical with DuckDB's list_dot_product; the
    positive is MAX over identical doubles (order-independent) and the
    margin is one shared-verbatim subtraction of two bit-identical
    doubles. An anchor whose label has no other member gets NULL
    pos_cosine/margin (left join), never a dropped anchor.

    Output: (query_id, vec_id, cosine, pos_cosine, margin, rank) with
    rank 1..k per anchor (cosine desc, vec_id tiebreak — total order).

    Scale posture: the anchor side broadcasts (bcast_attach — BHJ,
    codegen kept) and the corpus is scanned once; the scored frame is
    narrow (ids + doubles, vectors dropped) and is materialized before
    its two consumers (the positive aggregate and the negative window
    re-plan differently, so exchange reuse cannot fire — the round-7
    rule); the window partitions by anchor (bounded count by
    construction). At cluster scale the anchor set is a batch, not the
    corpus — the same shape as knn_join, which this extends with the
    label residual.
    """
    q = embeddings.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col(label_col).alias("qlabel"),
    )
    scored = (
        bcast_attach(spread(embeddings), q, id_col, "query_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .selectExpr(
            "query_id",
            "qlabel",
            id_col,
            label_col,
            f"{cosine_expr(vec_col, 'qv')} AS cosine",
        )
        .localCheckpoint()
    )
    pos = (
        scored.filter(F.col(label_col) == F.col("qlabel"))
        .groupBy("query_id")
        .agg(F.max("cosine").alias("pos_cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    neg = (
        scored.filter(F.col(label_col) != F.col("qlabel"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    return neg.join(F.broadcast(pos), "query_id", "left").selectExpr(
        "query_id",
        id_col,
        "cosine",
        "pos_cosine",
        "(pos_cosine - cosine) AS margin",
        "rank",
    )


def ivf_cell_balance(
    embeddings: DataFrame,
    centroids: DataFrame,
    n_cells: int,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF index-health report: per-cell population, corpus share, and an
    oversized flag — the observability half of the IVF maintenance
    family (an index whose appends have skewed a cell to many times the
    mean is due a re-train/split; at 100 TB you read THIS table before
    deciding to rebuild, you don't re-cluster on a hunch).

    ``share_ppm`` = HALF_UP(n·10⁶ / N); ``oversized`` = n·K > 2·N (the
    cell holds more than twice the mean population — exact integer
    cross-multiplication, no division). Cells with zero vectors still
    report (left join from the centroid table): silent empty cells are
    wasted probe budget and the report exists to surface them.

    ``n_cells`` is passed explicitly and must equal the centroid count —
    the graded-carrier pin-the-function rule: the oracle restates it as
    the same literal.

    Scale posture: one assignment pass (ivf_build — broadcast centroids,
    reducible argmin aggregate, never a window), a hash count to ≤ K
    rows, a broadcast 1-row total attach, integer projections. The
    vectors never shuffle.
    """
    assign = ivf_build(embeddings, centroids, dim, id_col, vec_col)
    counts = assign.groupBy("centroid_id").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("__c")
    )
    filled = (
        centroids.select("centroid_id")
        .join(counts, "centroid_id", "left")
        .selectExpr(
            "centroid_id",
            "CAST(coalesce(__c, 0) AS BIGINT) AS n_vectors",
        )
    )
    tot = filled.agg(F.expr("CAST(SUM(n_vectors) AS BIGINT)").alias("__n"))
    ppm = T.idiv(
        f"2000000 * {T.wint('n_vectors', S)} + __n", "2 * __n", S
    )
    return bcast_attach(filled, tot, "n_vectors", "__n").selectExpr(
        "centroid_id",
        "n_vectors",
        f"CAST({ppm} AS BIGINT) AS share_ppm",
        f"(n_vectors * {n_cells} > 2 * __n) AS oversized",
    )
