"""Text-analysis expression builders for large-scale training-data
pipelines: tokenization, shingling, quality stats, language-ID heuristics,
fingerprinting, MinHash primitives.

Everything here is a *SQL expression generator* parameterized by dialect
("spark" | "duck"): the engine evaluates the Spark form (JVM-side
higher-order functions — no Python UDFs in the hot path), and the DuckDB
oracle evaluates the duck form, so both sides are generated from the same
code and cannot drift semantically.

Determinism notes:
  * string→int hashing goes through md5 (identical algorithm in both
    engines) → first 15 hex chars → BIGINT (60 bits, overflow-free);
  * MinHash uses (a*x + b) mod P with P = 4294967311 (prime > 2^32) and
    small a/b so products stay < 2^38 — safe under Spark ANSI overflow
    checking and identical in both engines.
"""

from __future__ import annotations

SPARK = "spark"
DUCK = "duck"

# --- dialect primitives ----------------------------------------------------


def split_ws(text: str, d: str) -> str:
    return f"split({text}, ' ')" if d == SPARK else f"string_split({text}, ' ')"


def asize(arr: str, d: str) -> str:
    return f"size({arr})" if d == SPARK else f"len({arr})"


def elem(arr: str, i: str, d: str) -> str:  # 1-based in both dialects
    return f"element_at({arr}, {i})" if d == SPARK else f"({arr})[{i}]"


def seq(a: str, b: str, d: str) -> str:  # inclusive [a, b]
    return f"sequence({a}, {b})" if d == SPARK else f"range({a}, ({b}) + 1)"


def atransform(arr: str, var: str, body: str, d: str) -> str:
    fn = "transform" if d == SPARK else "list_transform"
    return f"{fn}({arr}, {var} -> {body})"


def afilter(arr: str, var: str, body: str, d: str) -> str:
    fn = "filter" if d == SPARK else "list_filter"
    return f"{fn}({arr}, {var} -> {body})"


def amin(arr: str, d: str) -> str:
    return f"array_min({arr})" if d == SPARK else f"list_min({arr})"


def aslice(arr: str, start: str, length: int, d: str) -> str:
    """1-based slice of ``length`` elements. Spark slice() takes a length;
    DuckDB list_slice() takes an inclusive end index."""
    if d == SPARK:
        return f"slice({arr}, {start}, {length})"
    return f"list_slice({arr}, {start}, ({start}) + {length - 1})"


def ajoin(arr: str, sep: str, d: str) -> str:
    fn = "array_join" if d == SPARK else "array_to_string"
    return f"{fn}({arr}, '{sep}')"


def idiv(a: str, b: str, d: str) -> str:
    """Integer division. Spark DIV truncates toward zero, DuckDB // floors —
    engine-equal ONLY for non-negative operands (every call site here)."""
    return f"(({a}) DIV ({b}))" if d == SPARK else f"(({a}) // ({b}))"


def adistinct(arr: str, d: str) -> str:
    """ORDER WARNING: the element SET is engine-equal but the order is not
    (Spark array_distinct keeps first-occurrence order, DuckDB
    list_distinct reorders) — never expose an adistinct array, or anything
    positional over it, in an oracle-compared output; reduce it with an
    order-insensitive fold (min, explode+agg) first."""
    return f"array_distinct({arr})" if d == SPARK else f"list_distinct({arr})"


def array_lit(x: str, d: str) -> str:
    return f"array({x})" if d == SPARK else f"[{x}]"


def hexint(s: str, d: str) -> str:
    """Deterministic 60-bit integer hash of a string via md5 (engine-equal)."""
    if d == SPARK:
        return f"CAST(conv(substr(md5({s}), 1, 15), 16, 10) AS BIGINT)"
    return f"CAST(('0x' || substr(md5({s}), 1, 15)) AS BIGINT)"


def hexwin(s: str, start: int, length: int, d: str) -> str:
    """Integer from a window of the md5 hex digest of ``s`` (engine-equal).
    Disjoint windows of ONE digest give independent hash families without
    re-hashing (round-5 lesson); 15 hex chars = 60 bits fits BIGINT."""
    if d == SPARK:
        return f"CAST(conv(substr(md5({s}), {start}, {length}), 16, 10) AS BIGINT)"
    return f"CAST(('0x' || substr(md5({s}), {start}, {length})) AS BIGINT)"


def wint(x: str, d: str) -> str:
    """Widen an integral expression past 64 bits, dialect-paired: Spark
    DECIMAL(38,0) vs DuckDB HUGEINT. Both are exact 128-bit-class integer
    arithmetic; use before multiplying BIGINT sums by 10^scale so the
    scaled HALF_UP division never overflows. Keep these values internal —
    the driver boundary only carries the final narrow casts."""
    return (
        f"CAST({x} AS DECIMAL(38,0))" if d == SPARK else f"CAST({x} AS HUGEINT)"
    )


def tostr(x: str, d: str) -> str:
    """Integer → string cast, dialect-paired (Spark STRING, DuckDB VARCHAR)."""
    return f"CAST({x} AS STRING)" if d == SPARK else f"CAST({x} AS VARCHAR)"


def bit(h: str, i: int, d: str) -> str:
    if d == SPARK:
        return f"(shiftright({h}, {i}) & 1)"
    return f"(({h} >> {i}) & 1)"


# --- tokenization / shingling ---------------------------------------------

# BPE-ish surface tokenizer: letter runs, digit runs, single punctuation
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_token_count(text: str, d: str) -> str:
    if d == SPARK:
        return f"size(regexp_extract_all({text}, '{BPE_PATTERN}', 0))"
    return f"len(regexp_extract_all({text}, '{BPE_PATTERN}'))"


def word_shingles(words: str, text: str, d: str, n: int = 3) -> str:
    """Distinct n-word shingles over a PRE-MATERIALIZED word array
    ``words`` (= split_ws(text), bound in a prior projection); documents
    shorter than n words shingle to the whole ``text``.

    The split must be materialized by the caller: Spark does not
    common-subexpression-eliminate a split() repeated inside transform
    lambdas — inlining it costs ~12× on this path (measured at sf0.1).
    """
    parts = ", ' ', ".join(elem(words, f"__i + {k}" if k else "__i", d) for k in range(n))
    shingle = f"concat({parts})"
    gen = atransform(seq("1", f"{asize(words, d)} - {n - 1}", d), "__i", shingle, d)
    return (
        f"CASE WHEN {asize(words, d)} >= {n} THEN {adistinct(gen, d)}"
        f" ELSE {array_lit(text, d)} END"
    )


def word_ngrams(words: str, d: str, n: int = 2) -> str:
    """ALL n-word grams in order, duplicates KEPT (repetition / quality
    signals need the multiset — ``word_shingles`` dedups for set
    similarity). Same pre-materialized ``words`` contract. Documents with
    fewer than n words yield an empty array (explode/unnest drop them)."""
    parts = ", ' ', ".join(elem(words, f"__i + {k}" if k else "__i", d) for k in range(n))
    gram = f"concat({parts})"
    gen = atransform(seq("1", f"{asize(words, d)} - {n - 1}", d), "__i", gram, d)
    empty = "CAST(array() AS ARRAY<STRING>)" if d == SPARK else "CAST([] AS VARCHAR[])"
    return f"CASE WHEN {asize(words, d)} >= {n} THEN {gen} ELSE {empty} END"


def word_chunks(words: str, d: str, w: int = 10) -> str:
    """Fixed-width ``w``-word chunks (the pluggable "paragraph" splitter for
    chunk-level dedup — this corpus has no newline structure, so spans of
    ``w`` consecutive words stand in for paragraphs; swapping in a
    newline/sentence splitter is a one-expression change). The last chunk
    may be shorter. Same pre-materialized ``words`` contract as
    :func:`word_shingles`. ``greatest(n,1)`` keeps the DIV operands
    non-negative so Spark DIV ≡ DuckDB // (see :func:`idiv`)."""
    n = asize(words, d)
    great = f"greatest({n}, 1)"  # same spelling in both dialects
    hi = idiv(f"{great} - 1", str(w), d)
    chunk = ajoin(aslice(words, f"__i * {w} + 1", w, d), " ", d)
    return atransform(seq("0", hi, d), "__i", chunk, d)


def sliding_word_chunks(words: str, d: str, window: int = 20, stride: int = 10) -> str:
    """Overlapping sliding word-window chunks (RAG-ingestion chunking):
    starts at 1, 1+stride, ... while the start lies inside the document;
    each chunk spans up to ``window`` words (tail chunks shorter). Same
    pre-materialized ``words`` contract as :func:`word_shingles`;
    ``greatest(n,1)`` keeps DIV operands non-negative (Spark DIV ≡
    DuckDB //)."""
    n = asize(words, d)
    great = f"greatest({n}, 1)"
    hi = idiv(f"{great} - 1", str(stride), d)
    chunk = ajoin(aslice(words, f"__i * {stride} + 1", window, d), " ", d)
    return atransform(seq("0", hi, d), "__i", chunk, d)


# --- winnowing fingerprints ------------------------------------------------

WINNOW_K = 8  # k-gram length (chars)
WINNOW_W = 4  # winnowing window (gram hashes)


def winnow_gram_hashes(text: str, d: str, k: int = WINNOW_K) -> str:
    """Hash of every k-char gram of ``text`` (the 'rolling hash' pass of
    winnowing, computed positionally — md5-derived so both engines agree
    bit-for-bit). Documents shorter than k hash as one whole-text gram;
    the guard also avoids Spark's descending sequence() when stop < start.
    """
    n = f"length({text})"
    gen = atransform(
        seq("1", f"{n} - {k - 1}", d), "__p", hexint(f"substr({text}, __p, {k})", d), d
    )
    return (
        f"CASE WHEN {n} >= {k} THEN {gen}"
        f" ELSE {array_lit(hexint(text, d), d)} END"
    )


def winnow_select(grams: str, d: str, w: int = WINNOW_W) -> str:
    """Winnowing selection (Schleimer/Wilkerson/Aiken, SIGMOD'03): the min
    hash of every w-length window over a PRE-MATERIALIZED gram-hash array
    ``grams`` (bind it in its own projection first — same no-CSE reasoning
    as word_shingles). Result keeps duplicate selections; reduce with
    explode + DISTINCT rows, never adistinct (order divergence)."""
    n = asize(grams, d)
    gen = atransform(
        seq("1", f"{n} - {w - 1}", d), "__j", amin(aslice(grams, "__j", w, d), d), d
    )
    return f"CASE WHEN {n} >= {w} THEN {gen} ELSE {array_lit(amin(grams, d), d)} END"


# --- MinHash ---------------------------------------------------------------

MINHASH_P = 4294967311  # prime > 2^32
MINHASH_K = 16
MINHASH_BANDS = 4
MINHASH_ROWS = 4  # K / BANDS


def minhash_params(j: int) -> tuple[int, int]:
    return 2 * j + 3, j * j + 1


def shingle_hash_expr(shingles_arr: str, d: str) -> str:
    """Array of 32-bit-range hashes for a shingle array. Materialize this
    ONCE per row (own projection) — inlining it into each of the K
    permutation expressions would recompute every md5 K times."""
    return atransform(shingles_arr, "__s", f"{hexint('__s', d)} % {MINHASH_P}", d)


def minhash_exprs(hashes_arr: str, d: str) -> list[str]:
    """K minhash values over a pre-hashed shingle array (see
    shingle_hash_expr): min over shingles of (a_j * h + b_j) mod P."""
    out = []
    for j in range(MINHASH_K):
        a, b = minhash_params(j)
        perm = atransform(hashes_arr, "__x", f"(({a} * __x + {b}) % {MINHASH_P})", d)
        out.append(f"{amin(perm, d)} AS m{j}")
    return out


def band_key_exprs(d: str) -> list[str]:
    """LSH band keys over materialized m0..m{K-1} columns."""
    out = []
    for band in range(MINHASH_BANDS):
        cols = ", ".join(
            f"m{band * MINHASH_ROWS + r}" for r in range(MINHASH_ROWS)
        )
        out.append(f"md5(concat_ws(',', {cols})) AS band{band}")
    return out


# --- quality stats / language ID ------------------------------------------

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
    "zh": ("de", "shi", "le", "zai", "he"),
}


def _in_list(var: str, words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"{var} IN ({lst})"


def stopword_count(text: str, d: str, words: tuple[str, ...] = EN_STOPWORDS) -> str:
    arr = afilter(split_ws(f"lower({text})", d), "__t", _in_list("__t", words), d)
    return asize(arr, d)


def lang_scores(text: str, d: str) -> list[str]:
    return [
        f"{stopword_count(text, d, words)} AS score_{lang}"
        for lang, words in LANG_MARKERS.items()
    ]


def lang_pick_expr() -> str:
    """argmax over materialized score_<lang> columns, ties broken by the
    fixed language order (en first); marker-free text (all scores zero)
    is 'und', not a default English guess."""
    langs = list(LANG_MARKERS)
    gl = ", ".join(f"score_{lang}" for lang in langs)
    clauses = " ".join(
        f"WHEN score_{lang} >= greatest({gl}) THEN '{lang}'" for lang in langs
    )
    return f"CASE WHEN greatest({gl}) = 0 THEN 'und' {clauses} ELSE 'und' END"


def regex_strip(text: str, pattern: str, d: str) -> str:
    """Remove every match of ``pattern`` (DuckDB needs the 'g' flag —
    its regexp_replace is first-match-only by default, Spark's is global)."""
    if d == SPARK:
        return f"regexp_replace({text}, '{pattern}', '')"
    return f"regexp_replace({text}, '{pattern}', '', 'g')"


def punct_ratio(text: str, d: str) -> str:
    # ratio of punctuation characters to total characters (double division,
    # identical IEEE semantics in both engines)
    punct = f"length({regex_strip(text, '[^.,;:!?]', d)})"
    return f"CAST({punct} AS DOUBLE) / CAST(length({text}) AS DOUBLE)"


def digit_ratio(text: str, d: str) -> str:
    digits = f"length({regex_strip(text, '[^0-9]', d)})"
    return f"CAST({digits} AS DOUBLE) / CAST(length({text}) AS DOUBLE)"


def quality_expr(text: str, d: str) -> str:
    """Composite document quality score in [0, 1] — single source of truth
    (used by text_stats, corpus_stats, and the curation pipeline's gate;
    hand-copies of the weights drifted once already)."""
    ntok = asize(split_ws(text, d), d)
    return (
        f"0.4 * least(CAST({ntok} AS DOUBLE) / 100.0, 1.0)"
        f" + 0.3 * (1.0 - {punct_ratio(text, d)})"
        f" + 0.3 * (1.0 - CAST({stopword_count(text, d)} AS DOUBLE)"
        f" / CAST({ntok} AS DOUBLE))"
    )
