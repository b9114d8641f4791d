"""Independent verification of the round-8 additions: exact substring
dedup (operators/dedup.py::substring_dup_spans / substring_dedup)
checked against hand-built documents whose duplicated spans are known by
construction, plus a pure-Python reconstruction on fixture data."""

import pytest

from etl_gamma_spark.io import load_table
from tests.conftest import SF_SMOKE

K = 4  # span threshold for hand-built cases (docs are short)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_substring_spans_hand_built(spark):
    from etl_gamma_spark.operators.dedup import substring_dup_spans

    texts = [
        "a b c d e f g h",          # doc 0
        "x y c d e f z w",          # doc 1: shares "c d e f" (4 tokens)
        "p q r s t u v",            # doc 2: nothing shared
        "m a b c d e f g n",        # doc 3: shares 7 tokens with doc 0,
                                    #        5 with doc 1? ("c d e f" only)
    ]
    rows = substring_dup_spans(_docs(spark, texts), k=K).collect()
    got = {(r.doc_a, r.doc_b): (r.a_start, r.b_start, r.n_tokens) for r in rows}
    # doc0 vs doc1: "c d e f" at a_start=3, b_start=3, 4 tokens
    # doc0 vs doc3: "a b c d e f g" at a_start=1, b_start=2, 7 tokens
    # doc1 vs doc3: "c d e f" at a_start=3, b_start=4, 4 tokens
    assert got == {
        (0, 1): (3, 3, 4),
        (0, 3): (1, 2, 7),
        (1, 3): (3, 4, 4),
    }


def test_substring_spans_intra_doc_repeat_and_multiple_spans(spark):
    from etl_gamma_spark.operators.dedup import substring_dup_spans

    # doc1 contains doc0's span TWICE (two diagonals -> two span rows),
    # and a second distinct shared span elsewhere
    texts = [
        "a b c d q q q u v w x q",
        "a b c d k a b c d m u v w x t",
    ]
    rows = substring_dup_spans(_docs(spark, texts), k=K).collect()
    got = sorted((r.a_start, r.b_start, r.n_tokens) for r in rows)
    assert got == [(1, 1, 4), (1, 6, 4), (8, 11, 4)]


def test_substring_spans_df_cap_drops_stop_grams(spark):
    from etl_gamma_spark.operators.dedup import substring_dup_spans

    # the shared gram appears in every doc: with max_df below its
    # occurrence count it is a stop-gram and no span is reported
    texts = ["s1 c d e f t1", "s2 c d e f t2", "s3 c d e f t3"]
    none = substring_dup_spans(_docs(spark, texts), k=K, max_df=2).collect()
    assert none == []
    some = substring_dup_spans(_docs(spark, texts), k=K, max_df=3).collect()
    assert len(some) == 3  # all three cross-document pairs


def test_substring_dedup_keep_first(spark):
    from etl_gamma_spark.operators.dedup import substring_dedup

    texts = [
        "a b c d e f g h",
        "x y c d e f z w",
        "p q r s t u v",
    ]
    got = {
        r.doc_id: (r.n_tokens, r.n_kept, r.text_clean)
        for r in substring_dedup(_docs(spark, texts), k=K).collect()
    }
    # doc 0 keeps everything (first occurrence), doc 1 loses "c d e f",
    # doc 2 untouched
    assert got[0] == (8, 8, "a b c d e f g h")
    assert got[1] == (8, 4, "x y z w")
    assert got[2] == (7, 7, "p q r s t u v")


def test_substring_dedup_fully_covered_doc_survives_with_empty_text(spark):
    from etl_gamma_spark.operators.dedup import substring_dedup

    texts = ["a b c d", "a b c d"]
    got = {
        r.doc_id: (r.n_tokens, r.n_kept, r.text_clean)
        for r in substring_dedup(_docs(spark, texts), k=K).collect()
    }
    assert got[0] == (4, 4, "a b c d")
    assert got[1] == (4, 0, "")


def _python_spans(texts_by_id, k, max_df):
    """Naive reference: hash every k-gram, drop grams over max_df
    occurrences, pair cross-document matches, merge diagonal runs."""
    from collections import defaultdict

    occ = defaultdict(list)  # gram -> [(doc, pos0)]
    for did, text in texts_by_id.items():
        w = text.split(" ")
        for p in range(len(w) - k + 1):
            occ[" ".join(w[p:p + k])].append((did, p))
    matches = defaultdict(set)  # (a, b, diag) -> {pa}
    for gram, locs in occ.items():
        if len(locs) > max_df:
            continue
        for da, pa in locs:
            for db, pb in locs:
                if da < db:
                    matches[(da, db, pa - pb)].add(pa)
    spans = set()
    for (da, db, diag), pas in matches.items():
        run = sorted(pas)
        start = prev = run[0]
        for p in run[1:] + [None]:
            if p is not None and p == prev + 1:
                prev = p
                continue
            n = prev - start + k
            spans.add((da, db, start + 1, start + 1 - diag, n))
            if p is not None:
                start = prev = p
    return spans


def test_substring_spans_match_python_reference_on_fixture(spark):
    from etl_gamma_spark.operators.dedup import substring_dup_spans

    docs = load_table(spark, SF_SMOKE, "documents")
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    want = _python_spans(texts, k=8, max_df=50)
    got = {
        (r.doc_a, r.doc_b, r.a_start, r.b_start, r.n_tokens)
        for r in substring_dup_spans(docs).collect()
    }
    assert got == want
    assert got, "fixture corpus should contain duplicated spans"


def test_substring_spans_guarantee_property(spark):
    """Every reported span re-extracts to IDENTICAL token runs in both
    documents, and is at least k tokens long."""
    from etl_gamma_spark.operators.dedup import substring_dup_spans

    docs = load_table(spark, SF_SMOKE, "documents")
    texts = {r.doc_id: r.text.split(" ") for r in docs.collect()}
    rows = substring_dup_spans(docs, k=8).collect()
    assert rows
    for r in rows:
        assert r.n_tokens >= 8
        a = texts[r.doc_a][r.a_start - 1 : r.a_start - 1 + r.n_tokens]
        b = texts[r.doc_b][r.b_start - 1 : r.b_start - 1 + r.n_tokens]
        assert a == b and len(a) == r.n_tokens


def test_substring_spans_are_maximal_runs(spark):
    """Span rows on one (pair, diagonal) never touch or overlap — the
    island merge produced MAXIMAL runs (a split span would show up as
    two rows with b-gap == a-gap)."""
    from collections import defaultdict

    from etl_gamma_spark.operators.dedup import substring_dup_spans

    docs = load_table(spark, SF_SMOKE, "documents")
    by_diag = defaultdict(list)
    for r in substring_dup_spans(docs, k=8).collect():
        by_diag[(r.doc_a, r.doc_b, r.a_start - r.b_start)].append(
            (r.a_start, r.n_tokens)
        )
    for spans in by_diag.values():
        spans.sort()
        for (s1, n1), (s2, _n2) in zip(spans, spans[1:]):
            assert s2 > s1 + n1, "adjacent runs should have merged"


def test_substring_dedup_conserves_tokens_on_fixture(spark):
    from etl_gamma_spark.operators.dedup import substring_dedup

    docs = load_table(spark, SF_SMOKE, "documents")
    out = substring_dedup(docs).collect()
    assert len(out) == docs.count()
    for r in out:
        assert 0 <= r.n_kept <= r.n_tokens
        if r.n_kept:
            assert len(r.text_clean.split(" ")) == r.n_kept
        else:
            assert r.text_clean == ""


def test_substring_dedup_removed_mass_matches_spans(spark):
    """Tokens removed per document == union of covered positions of the
    spans where that document is the doc_b (keep-first) side."""
    from collections import defaultdict

    from etl_gamma_spark.operators.dedup import (
        substring_dedup,
        substring_dup_spans,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    covered = defaultdict(set)
    for r in substring_dup_spans(docs).collect():
        covered[r.doc_b].update(range(r.b_start, r.b_start + r.n_tokens))
    removed = {
        r.doc_id: r.n_tokens - r.n_kept for r in substring_dedup(docs).collect()
    }
    for did, lost in removed.items():
        assert lost == len(covered.get(did, set()))


@pytest.mark.parametrize("k", [0, 1])
def test_substring_spans_rejects_degenerate_k(spark, k):
    from etl_gamma_spark.operators.dedup import substring_dup_spans

    with pytest.raises(ValueError):
        substring_dup_spans(_docs(spark, ["a b"]), k=k)


def test_decontamination_spans_hand_built(spark):
    from etl_gamma_spark.operators.dedup import decontamination_spans

    # bench_mod=2: even ids are "benchmark", odd ids are corpus
    texts = {
        0: "q1 a b c d q2 q3",          # bench
        1: "x a b c d y z w",           # corpus: quotes bench 0 ("a b c d")
        2: "p p p p p p p",             # bench, no matches
        3: "m n o r s t u",             # corpus, clean
        5: "q1 a b c d q2 q3",          # corpus: contains bench 0 entirely
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    rows = decontamination_spans(df, k=4, bench_mod=2).collect()
    got = {
        (r.doc_id, r.bench_id): (r.doc_start, r.bench_start, r.n_tokens)
        for r in rows
    }
    assert got == {
        (1, 0): (2, 2, 4),   # "a b c d"
        (5, 0): (1, 1, 7),   # whole text
    }


def test_decontamination_cap_counts_corpus_side_only(spark):
    from etl_gamma_spark.operators.dedup import decontamination_spans

    # the shared gram appears ONCE in the corpus but many times in bench
    # docs: a symmetric cap at max_df=2 would drop it; the corpus-side
    # cap must keep it (bench repetition cannot mask corpus matches)
    texts = {
        1: "x a b c d y",               # corpus (1 occurrence of the gram)
        0: "a b c d a b c d a b c d",   # bench: gram occurs at 3 diagonals
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    rows = decontamination_spans(df, k=4, bench_mod=2, max_df=2).collect()
    starts = sorted((r.doc_start, r.bench_start, r.n_tokens) for r in rows)
    assert starts == [(2, 1, 4), (2, 5, 4), (2, 9, 4)]


def test_decontamination_spans_extract_identically_on_fixture(spark):
    from etl_gamma_spark.operators.dedup import decontamination_spans

    docs = load_table(spark, SF_SMOKE, "documents")
    texts = {r.doc_id: r.text.split(" ") for r in docs.collect()}
    for r in decontamination_spans(docs).collect():
        assert r.bench_id % 23 == 0 and r.doc_id % 23 != 0
        assert r.n_tokens >= 8
        a = texts[r.doc_id][r.doc_start - 1 : r.doc_start - 1 + r.n_tokens]
        b = texts[r.bench_id][r.bench_start - 1 : r.bench_start - 1 + r.n_tokens]
        assert a == b


def test_substring_spans_fuzz_vs_python_reference(spark):
    """Seeded random corpus from a tiny alphabet (dense accidental
    overlaps, repeated tokens, degenerate runs) — the Spark spans must
    equal the naive Python reference exactly, including the df-cap."""
    import random

    rng = random.Random(0x5EED)
    alphabet = [f"t{i}" for i in range(8)]
    texts = {}
    for did in range(40):
        n = rng.randint(1, 30)
        words = [rng.choice(alphabet) for _ in range(n)]
        if did % 5 == 0 and did > 0:
            # splice a verbatim quote from an earlier doc
            src = texts[rng.randrange(did)].split(" ")
            if len(src) >= 4:
                s = rng.randrange(len(src) - 3)
                ln = rng.randint(4, len(src) - s)
                at = rng.randint(0, len(words))
                words[at:at] = src[s : s + ln]
        texts[did] = " ".join(words)
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    for k, max_df in ((3, 10), (4, 50)):
        from etl_gamma_spark.operators.dedup import substring_dup_spans

        got = {
            (r.doc_a, r.doc_b, r.a_start, r.b_start, r.n_tokens)
            for r in substring_dup_spans(df, k=k, max_df=max_df).collect()
        }
        want = _python_spans(texts, k=k, max_df=max_df)
        assert got == want, f"k={k} max_df={max_df}"
        assert want  # the corpus must actually exercise the machinery


def _python_decon_spans(texts_by_id, k, bench_mod, max_df):
    """Naive cross-corpus reference: corpus-side df-cap, bench side
    unconstrained, diagonal run merge per (doc, bench) pair."""
    from collections import defaultdict

    occ_c = defaultdict(list)
    occ_b = defaultdict(list)
    for did, text in texts_by_id.items():
        w = text.split(" ")
        tgt = occ_b if did % bench_mod == 0 else occ_c
        for p in range(len(w) - k + 1):
            tgt[" ".join(w[p:p + k])].append((did, p))
    matches = defaultdict(set)
    for gram, locs in occ_c.items():
        if len(locs) > max_df or gram not in occ_b:
            continue
        for dc, pc in locs:
            for db, pb in occ_b[gram]:
                matches[(dc, db, pc - pb)].add(pc)
    spans = set()
    for (dc, db, diag), pas in matches.items():
        run = sorted(pas)
        start = prev = run[0]
        for p in run[1:] + [None]:
            if p is not None and p == prev + 1:
                prev = p
                continue
            spans.add((dc, db, start + 1, start + 1 - diag, prev - start + k))
            if p is not None:
                start = prev = p
    return spans


def test_decontamination_fuzz_vs_python_reference(spark):
    import random

    from etl_gamma_spark.operators.dedup import decontamination_spans

    rng = random.Random(0xDEC0)
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
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        (r.doc_id, r.bench_id, r.doc_start, r.bench_start, r.n_tokens)
        for r in decontamination_spans(df, k=3, bench_mod=5, max_df=10).collect()
    }
    want = _python_decon_spans(texts, k=3, bench_mod=5, max_df=10)
    assert got == want
    assert want


def test_incremental_substring_matches_decon_shape_hand_built(spark):
    from etl_gamma_spark.operators.dedup import (
        incremental_substring_spans,
        kgram_postings,
    )

    corpus = _docs(spark, ["a b c d e f", "p q r s t u"])  # ids 0, 1
    batch = spark.createDataFrame(
        [(100, "x b c d e y"), (101, "k l m n o")],
        "doc_id long, text string",
    )
    rows = incremental_substring_spans(
        batch, kgram_postings(corpus, k=4), k=4
    ).collect()
    got = {
        (r.new_id, r.corpus_id): (r.new_start, r.corpus_start, r.n_tokens)
        for r in rows
    }
    assert got == {(100, 0): (2, 2, 4)}  # "b c d e"


def test_incremental_substring_persisted_index_round_trip(spark, tmp_path):
    """Writing the k-gram posting index and reading it back must give
    the identical span set — the corpus is never re-tokenized on the
    probe path."""
    from etl_gamma_spark.operators.dedup import (
        incremental_substring_spans,
        kgram_postings,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    batch = docs.filter("doc_id % 17 = 0")
    corpus = docs.filter("doc_id % 17 <> 0")
    live = kgram_postings(corpus)
    path = str(tmp_path / "kgram_index")
    live.write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)

    key = lambda r: (r.new_id, r.corpus_id, r.new_start, r.corpus_start, r.n_tokens)  # noqa: E731
    got_live = {key(r) for r in incremental_substring_spans(batch, live).collect()}
    got_stored = {key(r) for r in incremental_substring_spans(batch, stored).collect()}
    assert got_live == got_stored
    assert got_live, "fixture split should produce at least one span"
    # every span really is in the corpus slice and extracts identically
    texts = {r.doc_id: r.text.split(" ") for r in docs.collect()}
    for new_id, corpus_id, ns, cs, n in got_live:
        assert new_id % 17 == 0 and corpus_id % 17 != 0
        assert texts[new_id][ns - 1 : ns - 1 + n] == texts[corpus_id][cs - 1 : cs - 1 + n]


def test_semdedup_default_centroids_scale_with_corpus(spark):
    """n_centroids defaults to ceil(N / target_cell) floored at 16, so
    the adaptive run uses MORE cells on the same corpus at a smaller
    target cell, and the floor kicks in for small corpora."""
    from etl_gamma_spark.operators.similarity import semdedup_prune

    emb = load_table(spark, SF_SMOKE, "embeddings")  # 500 vectors
    floor = semdedup_prune(emb)  # ceil(500/256)=2 -> floored at 16
    n_floor = floor.select("centroid_id").distinct().count()
    assert n_floor <= 16
    assert floor.agg({"centroid_id": "max"}).first()[0] <= 15

    fine = semdedup_prune(emb, target_cell=25)  # ceil(500/25) = 20 cells
    assert fine.agg({"centroid_id": "max"}).first()[0] > 15
    # keep-first invariant holds under any K: the smallest id survives
    assert floor.agg({"vec_id": "min"}).first()[0] == emb.agg(
        {"vec_id": "min"}
    ).first()[0]
