"""Round-10 additions: the fixed-merge-table BPE encode oracle
(registry._bpe_encode_fixed_sql — the marker-wrapped recursive-CTE
restatement) and its equivalence to the engine's greedy-left merge fold.

The bpe_merges docstring's counterexample shows why an UNMARKED
string-replace restatement is unsound; these tests pin that the
chr(2)/chr(3)-wrapped form is exactly the fold: one replace() of
⟨lhs⟩⟨rhs⟩ merges all leftmost-nonoverlapping occurrences (symbol RUNS
included) and can never match across symbol boundaries."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_gamma_spark.registry import (
    _BPE_FIXED_MERGES,
    _bpe_encode_fixed_sql,
    _D,
)
from tests.test_round6_ops import _py_bpe_encode


def _duck_encode(text_rows, merges):
    """Run the recursive-CTE oracle over an in-memory documents table."""
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        list(enumerate(text_rows)),
    )
    sql = _bpe_encode_fixed_sql(_D, merges)
    return {t: n for t, n in con.execute(sql).fetchall()}


def _py_counts(text_rows):
    counts = {}
    for t in text_rows:
        for w in t.lower().split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
    return counts


def _py_encode(text_rows, merges):
    return _py_bpe_encode(
        _py_counts(text_rows), [(r, a, b, 0) for r, a, b in merges]
    )


def test_bpe_fixed_oracle_matches_python_on_hand_cases():
    merges = _BPE_FIXED_MERGES
    rows = [
        "the theater is in there",
        "standing and running and ending",
        "thththth aaaa anananan",  # runs + overlapping-candidate chains
        "errors earnings other",
    ]
    assert _duck_encode(rows, merges) == _py_encode(rows, merges)


def test_bpe_fixed_oracle_rejects_contract_breaking_symbols():
    """ADVICE r10: symbols land in single-quoted SQL literals delimited
    by \\x02/\\x03 markers — the generator must refuse symbols that
    would break or forge the generated oracle, not emit wrong SQL."""
    for bad in ("o'brien", "a\x02b", "c\x03"):
        with pytest.raises(ValueError):
            _bpe_encode_fixed_sql(_D, ((1, bad, "x"),))
        with pytest.raises(ValueError):
            _bpe_encode_fixed_sql(_D, ((1, "x", bad),))


def test_bpe_fixed_oracle_merges_symbol_runs_like_the_fold():
    # the documented divergence class for the UNMARKED restatement:
    # 'aaaa' under pair (a,a) must become [aa, aa]; 'aaa' -> [aa, a].
    merges = ((1, "a", "a"),)
    got = _duck_encode(["aaaa aaa aa a"], merges)
    assert got == {"aa": 4, "a": 2, "</w>": 4}


def test_bpe_fixed_oracle_rescans_for_newly_formed_lower_rank():
    # rank 1 = (a, bc) applies only AFTER rank 2 = (b, c) creates "bc"
    merges = ((1, "a", "bc"), (2, "b", "c"))
    got = _duck_encode(["abc"], merges)
    assert got == {"abc": 1, "</w>": 1}


@pytest.mark.parametrize("seed", range(8))
def test_bpe_fixed_oracle_fuzz_vs_python_reference(seed):
    rng = random.Random(seed)
    # tiny alphabet to force runs, chains, and re-scan interactions
    syms = ["a", "b", "c"]
    words = [
        "".join(rng.choice(syms) for _ in range(rng.randint(1, 8)))
        for _ in range(40)
    ]
    rows = [
        " ".join(rng.choice(words) for _ in range(rng.randint(1, 12)))
        for _ in range(10)
    ]
    # random merge table over plausible symbols (singles, merged pairs,
    # end-marker rights) — ranks unique, table size 6-12
    pool = syms + ["aa", "ab", "ba", "bc", "ca", "cb", "abc", "bca"]
    merges, seen = [], set()
    for rank in range(1, rng.randint(7, 13)):
        a = rng.choice(pool)
        b = rng.choice(pool + ["</w>"])
        if (a, b) in seen:
            continue
        seen.add((a, b))
        merges.append((rank, a, b))
    merges = tuple(merges)
    assert _duck_encode(rows, merges) == _py_encode(rows, merges)


def test_append_chunk_index_daily_ingest_loop(spark, tmp_path):
    """ADVICE r9 item 3's helper: append_chunk_index folds an accepted
    batch's NOVEL fingerprints in as one job-atomic append (+ optional
    rename-aside compaction), and the next day's probe over the stored
    index equals a probe over a live full-rebuild index."""
    import os

    from etl_gamma_spark.io import load_table
    from etl_gamma_spark.operators.dedup import (
        append_chunk_index,
        chunk_fingerprint_index,
        incremental_chunk_dedup,
    )
    from etl_gamma_spark.sources.sink import write_full_refresh
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    day0, day1, day2 = [docs.filter(f"doc_id % 3 = {i}") for i in range(3)]
    path = str(tmp_path / "chunk_index")
    write_full_refresh(chunk_fingerprint_index(day0), path)

    def result(batch, index):
        return {
            (r.doc_id, r.n_chunks, r.n_kept, r.text_clean)
            for r in incremental_chunk_dedup(batch, index).collect()
        }

    append_chunk_index(day1, path, compact_target_mb=64)
    got = result(day2, spark.read.parquet(path))
    want = result(day2, chunk_fingerprint_index(day0.unionByName(day1)))
    assert got == want
    # compaction swapped through rename-aside: no scratch dir left behind
    assert not os.path.exists(path + "._compacting")
    # novelty anti-join: appending the SAME batch again adds nothing
    n_before = spark.read.parquet(path).count()
    append_chunk_index(day1, path)
    assert spark.read.parquet(path).count() == n_before


def test_stamp_audit_pinned_vs_now(spark):
    """F16: the pinned as_of stamps the exact literal (oracle-checkable);
    the default keeps the reference's now() semantics — one plan-time
    value, not per-row clocks."""
    import datetime as dt

    from etl_gamma_spark.sources.sink import stamp_audit

    # collect() renders TimestampType as naive datetimes in the DRIVER's
    # local timezone (ADVICE r10: a naive-literal comparison assumed a
    # UTC host) — normalize both sides to aware UTC instants instead.
    def _utc(naive):
        return naive.astimezone(dt.timezone.utc)

    df = spark.range(5)
    pinned = stamp_audit(df, as_of="1996-01-15 07:30:00")
    vals = {_utc(r.updated_at) for r in pinned.collect()}
    assert vals == {
        dt.datetime(1996, 1, 15, 7, 30, tzinfo=dt.timezone.utc)
    }
    now_vals = {_utc(r.updated_at) for r in stamp_audit(df).collect()}
    assert len(now_vals) == 1  # one stamp per write, vectorized
    assert abs(
        (now_vals.pop() - dt.datetime.now(dt.timezone.utc)).total_seconds()
    ) < 600


def test_containment_catches_quote_that_jaccard_misses(spark):
    """The operator's reason to exist: a short doc quoted inside a much
    longer one clears containment while Jaccard stays far below any
    dedup threshold — and the mutual-near-dup case emits BOTH
    directions."""
    from etl_gamma_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog tonight"
    filler = " ".join(f"w{i} v{i} u{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, quote),
            (2, filler + " " + quote + " " + filler.upper()),
            (3, "alpha beta gamma delta epsilon zeta"),
            (4, "alpha beta gamma delta epsilon zeta"),
        ],
        "doc_id long, text string",
    )
    cont = {
        (r.doc_contained, r.doc_container): r.containment
        for r in ngram_containment_pairs(docs, threshold=0.5).collect()
    }
    assert cont[(1, 2)] == 1.0  # every shingle of the quote is in the container
    assert (2, 1) not in cont  # asymmetric: the container is not contained
    assert cont[(3, 4)] == 1.0 and cont[(4, 3)] == 1.0  # mutual dup: both ways
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    assert jac[(1, 2)] < 0.2  # the Jaccard pass would have shipped it


def test_cluster_size_histogram_accounting(spark):
    """Histogram invariants on a hand-built clustering: sizes bucket
    correctly, n_docs sums to the corpus, and n_redundant is exactly the
    mass cluster_prune would remove (docs minus one keeper each)."""
    from etl_gamma_spark.operators.dedup import cluster_size_histogram

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5), (7, 7)],
        "doc_id long, cluster_id long",
    )
    got = {
        r.n_members: (r.n_clusters, r.n_docs, r.n_redundant)
        for r in cluster_size_histogram(clusters).collect()
    }
    assert got == {3: (1, 3, 2), 2: (1, 2, 1), 1: (2, 2, 0)}
    assert sum(d for _, d, _ in got.values()) == 7
    assert sum(r for _, _, r in got.values()) == 3  # prune removes 3 docs


def test_cluster_aware_split_never_straddles_a_cluster(spark):
    """The op's contract: every near-dup cluster lands whole in one
    split — and the doc-hash split (dataset_split's bucket) WOULD have
    straddled at least one of these clusters, demonstrating the leak
    the cluster-keyed hash prevents."""
    from etl_gamma_spark.functions import text as T
    from etl_gamma_spark.operators.dedup import cluster_aware_split

    # 40 docs in 8 clusters of 5 (ids chosen so doc-hash buckets differ
    # within clusters with overwhelming probability)
    rows = [(c * 100 + i, c * 100) for c in range(8) for i in range(5)]
    clusters = spark.createDataFrame(rows, "doc_id long, cluster_id long")
    labeled = cluster_aware_split(clusters, train_pct=60, val_pct=20)
    per_cluster = {
        r.cluster_id: r.n
        for r in labeled.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n"))
        .collect()
    }
    assert set(per_cluster.values()) == {1}  # no cluster straddles
    splits = {r.split for r in labeled.collect()}
    assert len(splits) > 1  # the hash actually spreads across splits
    doc_buckets = clusters.selectExpr(
        "cluster_id",
        f"{T.hexint('CAST(doc_id AS STRING)', T.SPARK)} % 100 < 60 AS in_train",
    )
    straddled = (
        doc_buckets.groupBy("cluster_id")
        .agg(F.countDistinct("in_train").alias("n"))
        .filter("n > 1")
        .count()
    )
    assert straddled > 0  # the doc-hash split would have leaked
