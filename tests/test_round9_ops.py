"""Round-9 additions: substring posting-index maintenance
(write_substring_index / append_substring_index — the daily-ingest loop
probe → accept → append, VERDICT r8 item 2) and the persisted-quantizer
SemDeDup path (VERDICT r8 item 3)."""

import glob

from etl_gamma_spark.io import load_table
from tests.conftest import SF_SMOKE

K = 4  # span threshold for hand-verifiable cases


def _span_key(r):
    return (r.new_id, r.corpus_id, r.new_start, r.corpus_start, r.n_tokens)


def _spans(batch, index, k=K):
    from etl_gamma_spark.operators.dedup import incremental_substring_spans

    return {_span_key(r) for r in incremental_substring_spans(batch, index, k=k).collect()}


def test_append_substring_index_daily_ingest_loop(spark, tmp_path):
    """The full maintenance story, exercised over TWO ingest days: after
    each append, probing the stored index must equal probing a from-
    scratch rebuild over everything accepted so far."""
    from etl_gamma_spark.operators.dedup import (
        append_substring_index,
        kgram_postings,
        write_substring_index,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    day0 = docs.filter("doc_id % 3 = 0")   # initial corpus
    day1 = docs.filter("doc_id % 3 = 1")   # first ingest batch
    day2 = docs.filter("doc_id % 3 = 2")   # second ingest batch

    path = str(tmp_path / "substring_index")
    write_substring_index(day0, path, k=K)
    stored = lambda: spark.read.parquet(path)  # noqa: E731

    # day 1: probe against day0, accept, append
    got1 = _spans(day1, stored())
    want1 = _spans(day1, kgram_postings(day0, k=K))
    assert got1 == want1
    assert got1, "fixture slices should share at least one span"
    append_substring_index(day1, path, k=K)

    # day 2: probe must now see day0 AND day1 postings
    got2 = _spans(day2, stored())
    want2 = _spans(day2, kgram_postings(day0.unionByName(day1), k=K))
    assert got2 == want2
    # day-1 matches alone would be a proper subset: prove the append is
    # actually visible (day2 shares spans with day1 docs too)
    assert any(cid % 3 == 1 for _, cid, *_ in got2)
    append_substring_index(day2, path, k=K)

    # final: a fresh batch probed against the twice-appended index equals
    # the full rebuild over all three slices
    probe = docs.filter("doc_id % 17 = 0")
    got3 = _spans(probe, stored())
    want3 = _spans(probe, kgram_postings(docs, k=K))
    assert got3 == want3


def test_append_substring_index_compaction_preserves_spans(spark, tmp_path):
    """compact_target_mb bin-packs the accreted append files through the
    rename-aside swap without changing a single posting."""
    from etl_gamma_spark.operators.dedup import (
        append_substring_index,
        write_substring_index,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "substring_index")
    write_substring_index(docs.filter("doc_id % 3 = 0"), path, k=K)
    append_substring_index(docs.filter("doc_id % 3 = 1"), path, k=K)

    probe = docs.filter("doc_id % 3 = 2")
    before = _spans(probe, spark.read.parquet(path))
    n_before = len(glob.glob(f"{path}/**/*.parquet", recursive=True))

    # compacting append: fold day-2 in and bin-pack everything
    append_substring_index(probe, path, k=K, compact_target_mb=64)
    n_after = len(glob.glob(f"{path}/**/*.parquet", recursive=True))
    assert n_after < n_before + 32  # accreted files were packed, not added
    assert not glob.glob(f"{path}._replaced"), "swap must clean up"

    # postings survived byte-for-byte: the pre-compaction probe answer is
    # reproduced, and the probe batch's own postings are now present
    after = _spans(probe, spark.read.parquet(path))
    assert before <= after  # self-matches (probe docs now indexed) add rows
    got_old = {s for s in after if s[1] % 3 != 2}
    assert got_old == before


def test_append_substring_index_costs_o_batch(spark, tmp_path):
    """The append must not read the stored index: the plan for the
    batch's postings write scans only the batch frame."""
    from etl_gamma_spark.operators.dedup import (
        _bucketed_postings,
        write_substring_index,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "substring_index")
    write_substring_index(docs.filter("doc_id % 3 = 0"), path, k=K)
    batch = docs.filter("doc_id % 3 = 1")
    frame = _bucketed_postings(batch, "text", "doc_id", K, 32)
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = frame._jdf.queryExecution().explainString(mode)
    assert "substring_index" not in plan  # no scan of the stored directory
    assert plan.count("Location: InMemoryFileIndex") == 1  # the batch scan only


def test_append_minhash_index_daily_ingest_loop(spark, tmp_path):
    """The MinHash sibling of the substring maintenance loop: after each
    append, probing the stored band index equals probing a from-scratch
    in-memory index over everything accepted so far."""
    from etl_gamma_spark.operators.dedup import (
        append_minhash_index,
        incremental_neardup_pairs,
        minhash_band_index,
        write_minhash_index,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    day0 = docs.filter("doc_id % 3 = 0")
    day1 = docs.filter("doc_id % 3 = 1")
    day2 = docs.filter("doc_id % 3 = 2")

    path = str(tmp_path / "minhash_index")
    write_minhash_index(day0, path)

    def pairs(batch, index):
        return {
            (r.new_id, r.corpus_id, round(r.est_jaccard, 6))
            for r in incremental_neardup_pairs(batch, index).collect()
        }

    got1 = pairs(day1, spark.read.parquet(path))
    want1 = pairs(day1, minhash_band_index(day0))
    assert got1 == want1
    append_minhash_index(day1, path)

    got2 = pairs(day2, spark.read.parquet(path))
    want2 = pairs(day2, minhash_band_index(day0.unionByName(day1)))
    assert got2 == want2
    assert want2, "fixture slices should produce candidate pairs"
    # second append with compaction: postings byte-identical afterwards
    append_minhash_index(day2, path, compact_target_mb=64)
    probe = docs.filter("doc_id % 17 = 0")
    got3 = pairs(probe, spark.read.parquet(path))
    want3 = pairs(probe, minhash_band_index(docs))
    assert got3 == want3


def test_decontaminate_corpus_strips_quoted_bench_passage(spark):
    """The act step of benchmark decontamination: a corpus doc quoting a
    benchmark passage loses exactly the quoted tokens; clean docs pass
    through untouched; benchmark docs are excluded from the output."""
    from etl_gamma_spark.operators.dedup import decontaminate_corpus

    bench_text = "q1 q2 q3 q4 q5 q6"
    rows = [
        (0, bench_text),                          # bench doc (0 % 3 == 0)
        (1, "a b q2 q3 q4 q5 c d"),               # quotes 4 bench tokens
        (2, "x y z w v u t s"),                   # clean
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_tokens, r.n_kept, r.text_clean)
        for r in decontaminate_corpus(df, k=4, bench_mod=3, max_df=50).collect()
    }
    assert set(out) == {1, 2}  # bench doc 0 excluded
    assert out[1] == (8, 4, "a b c d")
    assert out[2] == (8, 8, "x y z w v u t s")


def test_decontaminate_corpus_fuzz_vs_python_reference(spark):
    """Strip reconstruction fuzz: spans from the round-8 pure-Python
    reference, applied positionally in Python, must equal the engine's
    reassembled corpus."""
    import random

    from etl_gamma_spark.operators.dedup import decontaminate_corpus
    from tests.test_round8_ops import _python_decon_spans

    rng = random.Random(0x9DEC)
    alphabet = [f"t{i}" for i in range(8)]
    texts = {}
    for did in range(40):
        words = [rng.choice(alphabet) for _ in range(rng.randint(1, 30))]
        if did % 4 == 0 and did > 3:
            src = texts[rng.randrange(did)].split(" ")
            if len(src) >= 4:
                s = rng.randrange(len(src) - 3)
                words.extend(src[s : s + rng.randint(4, len(src) - s)])
        texts[did] = " ".join(words)

    k, bench_mod, max_df = 3, 5, 10
    spans = _python_decon_spans(texts, k=k, bench_mod=bench_mod, max_df=max_df)
    covered = {}  # doc_id -> set of 0-based positions
    for doc_id, _bench, doc_start, _bs, n in spans:
        covered.setdefault(doc_id, set()).update(
            range(doc_start - 1, doc_start - 1 + n)
        )
    want = {}
    for did, t in texts.items():
        if did % bench_mod == 0:
            continue
        w = t.split(" ")
        keep = [x for i, x in enumerate(w) if i not in covered.get(did, ())]
        want[did] = (len(w), len(keep), " ".join(keep))

    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_kept, r.text_clean)
        for r in decontaminate_corpus(
            df, k=k, bench_mod=bench_mod, max_df=max_df
        ).collect()
    }
    assert got == want
    assert any(n_kept < n for n, n_kept, _ in want.values())  # it stripped


# --- persisted-quantizer SemDeDup (VERDICT r8 item 3) -----------------------


def _prune_set(df):
    return {(r.vec_id, r.centroid_id) for r in df.collect()}


def test_semdedup_persisted_trained_quantizer_reuse(spark, tmp_path):
    """The documented path past the K=4096 cap: train the quantizer once
    (Lloyd's), persist it, and reuse it — the stored table must reproduce
    the in-memory quantizer's prune set EXACTLY (same K, same seeds →
    identical assignment → identical prune set), across two runs."""
    from etl_gamma_spark.operators.similarity import (
        semdedup_prune,
        train_centroids,
    )
    from etl_gamma_spark.sources.sink import write_full_refresh

    emb = load_table(spark, SF_SMOKE, "embeddings")
    trained = train_centroids(emb, n_centroids=16)
    path = str(tmp_path / "quantizer")
    write_full_refresh(trained, path)
    stored = spark.read.parquet(path)

    want = _prune_set(semdedup_prune(emb, centroids=trained))
    got1 = _prune_set(semdedup_prune(emb, centroids=stored))
    got2 = _prune_set(semdedup_prune(emb, centroids=stored))  # re-run, same
    assert got1 == want
    assert got2 == want
    assert 0 < len(want) < emb.count()  # it actually pruned something


def test_semdedup_explicit_seed_quantizer_matches_default_path(spark):
    """Passing seed_centroids(K) explicitly must equal the n_centroids=K
    seeded path — the quantizer parameter is a pure generalization."""
    from etl_gamma_spark.operators.similarity import (
        seed_centroids,
        semdedup_prune,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    via_k = _prune_set(semdedup_prune(emb, n_centroids=16))
    via_q = _prune_set(semdedup_prune(emb, centroids=seed_centroids(emb, 16)))
    assert via_q == via_k


# ---------------------------------------------------------------------------
# intra-document repeated spans (find) + keep-first strip (act)
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rep_spans(spark, rows, k, max_rep=50):
    from etl_gamma_spark.operators.dedup import intradoc_repeat_spans

    df = intradoc_repeat_spans(_docs(spark, rows), k=k, max_rep=max_rep)
    return {
        (r.doc_id, r.rep_start, r.first_start, r.n_tokens)
        for r in df.collect()
    }


def test_intradoc_spans_periodic_text(spark):
    """'a b c' x3, k=3: the period-3 diagonal carries one maximal 6-token
    span (tokens 4-9 repeat 1-6) and the period-6 diagonal its 3-token
    echo — hand-computed, the same per-diagonal convention as the
    cross-document operator."""
    got = _rep_spans(spark, [(1, "a b c a b c a b c")], k=3)
    assert got == {(1, 4, 1, 6), (1, 7, 1, 3)}


def test_intradoc_spans_non_adjacent_repeat(spark):
    # gram (x y z) at positions 1 and 6 (1-based); nothing else repeats
    got = _rep_spans(spark, [(7, "x y z q w x y z")], k=3)
    assert got == {(7, 6, 1, 3)}


def test_intradoc_spans_cross_document_sharing_is_not_a_repeat(spark):
    # two documents sharing a passage have NO within-doc repeats
    rows = [(1, "p q r s t u"), (2, "p q r s t u")]
    assert _rep_spans(spark, rows, k=3) == set()


def test_intradoc_spans_max_rep_cap_drops_degenerate_grams(spark):
    # 'a' x6, k=2: the single gram occurs 5 times in one doc; with
    # max_rep=2 every anchor is capped away (conservative, mirrored by
    # the oracle HAVING over (doc_id, gh))
    assert _rep_spans(spark, [(3, "a a a a a a")], k=2, max_rep=2) == set()
    # uncapped, the diag=1 run covers the whole tail
    got = _rep_spans(spark, [(3, "a a a a a a")], k=2, max_rep=50)
    assert (3, 2, 1, 5) in got


def test_intradoc_strip_keeps_first_period(spark):
    from etl_gamma_spark.operators.dedup import strip_intradoc_repeats

    rows = [(1, "a b c a b c a b c"), (2, "no repeats at all here")]
    out = {
        r.doc_id: r
        for r in strip_intradoc_repeats(_docs(spark, rows), k=3).collect()
    }
    assert out[1].text_clean == "a b c"
    assert (out[1].n_tokens, out[1].n_kept) == (9, 3)
    # repeat-free document passes through untouched
    assert out[2].text_clean == "no repeats at all here"
    assert out[2].n_tokens == out[2].n_kept == 5


def test_intradoc_strip_removes_only_later_copies(spark):
    from etl_gamma_spark.operators.dedup import strip_intradoc_repeats

    rows = [(9, "x y z q w x y z")]
    out = strip_intradoc_repeats(_docs(spark, rows), k=3).collect()[0]
    assert out.text_clean == "x y z q w"
    assert (out.n_tokens, out.n_kept) == (8, 5)


def _python_intradoc_spans(texts_by_id, k, max_rep):
    """Naive reference: per document, hash every k-gram, drop grams with
    more than max_rep in-document occurrences, pair later-vs-earlier
    positions, merge diagonal runs."""
    from collections import defaultdict

    spans = set()
    for did, text in texts_by_id.items():
        w = text.split(" ")
        occ = defaultdict(list)
        for p in range(len(w) - k + 1):
            occ[" ".join(w[p:p + k])].append(p)
        matches = defaultdict(set)  # diag -> {pa}
        for locs in occ.values():
            if len(locs) > max_rep:
                continue
            for pa in locs:
                for pb in locs:
                    if pa > pb:
                        matches[pa - pb].add(pa)
        for diag, pas in matches.items():
            run = sorted(pas)
            start = prev = run[0]
            for p in run[1:] + [None]:
                if p is not None and p == prev + 1:
                    prev = p
                    continue
                spans.add((did, start + 1, start + 1 - diag, prev - start + k))
                if p is not None:
                    start = prev = p
    return spans


def _python_intradoc_strip(texts_by_id, k, max_rep):
    from collections import defaultdict

    cov = defaultdict(set)
    for did, rep_start, _first, n in _python_intradoc_spans(
        texts_by_id, k, max_rep
    ):
        cov[did].update(range(rep_start, rep_start + n))  # 1-based
    out = {}
    for did, text in texts_by_id.items():
        w = text.split(" ")
        kept = [word for i, word in enumerate(w) if (i + 1) not in cov[did]]
        out[did] = (len(w), len(kept), " ".join(kept))
    return out


def test_intradoc_spans_fuzz_vs_python_reference(spark):
    """Seeded random corpus from a tiny alphabet (dense accidental
    repeats) with explicit self-splices — Spark spans and strip must
    equal the naive Python reference exactly, including the per-(doc,
    gram) cap."""
    import random

    from etl_gamma_spark.operators.dedup import (
        intradoc_repeat_spans,
        strip_intradoc_repeats,
    )

    rng = random.Random(0xD0C5EED)
    alphabet = [f"t{i}" for i in range(6)]
    texts = {}
    for did in range(35):
        n = rng.randint(1, 25)
        words = [rng.choice(alphabet) for _ in range(n)]
        if did % 4 == 0 and len(words) >= 4:
            # splice a verbatim copy of a segment back into the same doc
            s = rng.randrange(len(words) - 3)
            ln = rng.randint(4, len(words) - s)
            at = rng.randint(0, len(words))
            words[at:at] = words[s:s + ln]
        texts[did] = " ".join(words)
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")

    for k, max_rep in ((3, 4), (4, 50)):
        got = {
            (r.doc_id, r.rep_start, r.first_start, r.n_tokens)
            for r in intradoc_repeat_spans(df, k=k, max_rep=max_rep).collect()
        }
        want = _python_intradoc_spans(texts, k, max_rep)
        assert got == want, f"k={k} max_rep={max_rep}"
        assert want  # the corpus must actually exercise the machinery

    got_strip = {
        r.doc_id: (r.n_tokens, r.n_kept, r.text_clean)
        for r in strip_intradoc_repeats(df, k=3, max_rep=50).collect()
    }
    assert got_strip == _python_intradoc_strip(texts, 3, 50)


# ---------------------------------------------------------------------------
# content-defined chunking (gear/Rabin cut) + shift-robust chunk dedup
# ---------------------------------------------------------------------------


def test_content_chunks_partition_each_document_exactly(spark):
    """Chunks concatenated in chunk_start order must reproduce every
    document's token stream — boundaries partition, never drop or
    duplicate."""
    from pyspark.sql import functions as F

    from etl_gamma_spark.operators.dedup import content_defined_chunks

    docs = load_table(spark, SF_SMOKE, "documents")
    chunks = content_defined_chunks(docs)
    rebuilt = {
        r.doc_id: r.txt
        for r in chunks.groupBy("doc_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(chunk_start, chunk_text))), x -> x.chunk_text), ' ')"
            ).alias("txt")
        )
        .collect()
    }
    want = {
        r.doc_id: " ".join(r.text.split())
        for r in docs.select("doc_id", "text").collect()
    }
    assert rebuilt == want


def test_content_chunk_dedup_is_shift_robust(spark):
    """The reason this operator exists: one token prepended to a copy
    re-chunks only up to the first surviving cut, so the copy's later
    chunks still dedup — where fixed-width chunking loses ALL alignment
    and removes nothing."""
    from etl_gamma_spark.operators.dedup import chunk_dedup, content_chunk_dedup

    words = " ".join(f"w{i}" for i in range(120))
    df = spark.createDataFrame(
        [(1, words), (2, "zzz " + words)], "doc_id long, text string"
    )
    cdc = {r.doc_id: r for r in content_chunk_dedup(df).collect()}
    assert cdc[1].n_kept == cdc[1].n_chunks  # first doc untouched
    assert cdc[2].n_kept < cdc[2].n_chunks   # shifted copy still dedups
    # the shifted copy keeps its unique prefix, loses the realigned tail
    assert cdc[2].text_clean.startswith("zzz")

    fixed = {r.doc_id: r for r in chunk_dedup(df).collect()}
    assert fixed[2].n_kept == fixed[2].n_chunks  # fixed windows: no match


def _python_content_chunk_dedup(texts_by_id, w=4, mask_mod=8):
    """Naive reference: md5-based gear cuts, running chunk ids, corpus
    keep-first by (doc_id, chunk_start) per chunk text, reassembly."""
    import hashlib

    def hexint(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    chunks = {}  # (doc, start1) -> text, in doc order
    per_doc = {}
    for did in sorted(texts_by_id):
        words = texts_by_id[did].split(" ")
        cut = {1}
        for p in range(1, len(words) - w + 1):  # gram start pos0 p > 0
            if hexint(" ".join(words[p:p + w])) % mask_mod == 0:
                cut.add(p + 1)
        doc_chunks = []
        cur, start = [], 1
        for i, word in enumerate(words):
            if i + 1 in cut and cur:
                doc_chunks.append((start, " ".join(cur)))
                cur, start = [], i + 1
            cur.append(word)
        if cur:
            doc_chunks.append((start, " ".join(cur)))
        per_doc[did] = doc_chunks
    seen = {}
    for did in sorted(per_doc):
        for start, text in per_doc[did]:
            key = text
            if key not in seen or (did, start) < seen[key]:
                seen[key] = (did, start)
    out = {}
    for did in sorted(per_doc):
        kept = [(s, t) for s, t in per_doc[did] if seen[t] == (did, s)]
        out[did] = (
            len(per_doc[did]),
            len(kept),
            " ".join(t for _, t in sorted(kept)),
        )
    return out


def test_content_chunk_dedup_fuzz_vs_python_reference(spark):
    """Seeded tiny-alphabet corpus with verbatim cross-document splices —
    the engine must equal the naive reference exactly (cut positions,
    keep-first winners, reassembly)."""
    import random

    from etl_gamma_spark.operators.dedup import content_chunk_dedup

    rng = random.Random(0xC0FFEE)
    alphabet = [f"t{i}" for i in range(8)]
    texts = {}
    for did in range(40):
        n = rng.randint(1, 40)
        words = [rng.choice(alphabet) for _ in range(n)]
        if did % 5 == 0 and did > 0:
            src = texts[rng.randrange(did)].split(" ")
            if len(src) >= 6:
                s = rng.randrange(len(src) - 5)
                ln = rng.randint(6, len(src) - s)
                at = rng.randint(0, len(words))
                words[at:at] = src[s:s + ln]
        texts[did] = " ".join(words)
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.text_clean)
        for r in content_chunk_dedup(df).collect()
    }
    want = _python_content_chunk_dedup(texts)
    assert got == want
    assert any(k < c for c, k, _ in want.values())  # dedup actually fired


def test_incremental_chunk_dedup_daily_ingest_loop(spark, tmp_path):
    """The chunk-index maintenance story: probing a stored fingerprint
    index equals probing a live one, and after appending an accepted
    batch's NOVEL fingerprints (the documented O(batch) append — probe
    survivors are novel by construction) the next day's probe equals a
    full index rebuild."""
    from etl_gamma_spark.operators.dedup import (
        chunk_fingerprint_index,
        incremental_chunk_dedup,
    )
    from etl_gamma_spark.sources.sink import write_full_refresh

    docs = load_table(spark, SF_SMOKE, "documents")
    day0, day1, day2 = [docs.filter(f"doc_id % 3 = {i}") for i in range(3)]
    path = str(tmp_path / "chunk_index")
    write_full_refresh(chunk_fingerprint_index(day0), path)
    stored = lambda: spark.read.parquet(path)  # noqa: E731

    def result(batch, index):
        return {
            (r.doc_id, r.n_chunks, r.n_kept, r.text_clean)
            for r in incremental_chunk_dedup(batch, index).collect()
        }

    got1 = result(day1, stored())
    want1 = result(day1, chunk_fingerprint_index(day0))
    assert got1 == want1
    assert any(k < c for _, c, k, _ in got1)  # batch chunks hit the index

    novel = chunk_fingerprint_index(day1).join(
        stored().select("fh"), "fh", "left_anti"
    )
    novel.write.mode("append").parquet(path)

    got2 = result(day2, stored())
    want2 = result(day2, chunk_fingerprint_index(day0.unionByName(day1)))
    assert got2 == want2
