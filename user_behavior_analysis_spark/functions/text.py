"""Text-analysis column functions for training-data pipelines.

Tokenization, n-gram shingling, quality scoring, language-ID heuristic,
and document fingerprinting — all as native column expressions so they
run inside whole-stage codegen over arbitrarily wide scans. Designed for
the ``documents`` table but schema-agnostic.

Cross-engine determinism notes:
* tokenization = lower → trim → split on ``\\s+`` (same regex both
  engines);
* hashes via md5 (identical hex in Spark and DuckDB); 15-hex-digit
  prefixes → BIGINT stay under 2^60 so signed 64-bit is safe.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: small multilingual stopword marker sets for the language heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("的", "是", "了", "在", "我"),
}

STOPWORDS_EN = ("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of lowercased text (empty string → [''])."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count(text: Column | str, toks: Column | None = None) -> Column:
    return F.size(toks if toks is not None else tokens(text))


def word_ngrams(tokens_col: str, n: int) -> Column:
    """Array of space-joined word n-grams over a materialized tokens
    column (Spark array subscripts are 0-based; DuckDB twin uses
    1-based ``t[i]`` in a list comprehension). Short docs → empty array.
    """
    inner = ", ' ', ".join(f"{tokens_col}[i + {j}]" for j in range(n))
    return F.when(
        F.size(F.col(tokens_col)) >= n,
        F.expr(f"transform(sequence(0, size({tokens_col}) - {n}), "
               f"i -> concat({inner}))"),
    ).otherwise(F.array().cast("array<string>"))


def md5_prefix_hash(col: Column, seed: int | None = None) -> Column:
    """Deterministic 60-bit hash via md5 hex prefix — identical in DuckDB
    as ``CAST(('0x' || substr(md5(...),1,15)) AS BIGINT)``."""
    src = F.concat(F.lit(f"{seed}|"), col) if seed is not None else col
    return F.conv(F.substring(F.md5(src), 1, 15), 16, 10).cast("long")


#: the exact char set Java regex ``[A-Za-z0-9\s]`` covers (\s is ASCII
#: [ \t\n\x0B\f\r] under Java's default flags) — used as a translate
#: delete-set so the punct count needs no regex engine at all.
_ALNUM_WS = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
             "abcdefghijklmnopqrstuvwxyz"
             "0123456789 \t\n\x0b\f\r")


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space.

    Computed as ``length(translate(text, alnum+ws, ''))`` — translate is
    a per-char table lookup, so this costs one linear pass with no regex
    automaton. Equivalent by construction to counting ``[^A-Za-z0-9\\s]``
    matches: translate deletes exactly the chars that regex class keeps
    out of the count, and every surviving char (incl. non-ASCII letters)
    is punct under both formulations."""
    text = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(F.translate(text, _ALNUM_WS, ""))
    return F.when(F.length(text) > 0,
                  n_punct.cast("double") / F.length(text)
                  ).otherwise(F.lit(0.0))


def stopword_ratio(text: Column | str,
                   stopwords: tuple[str, ...] = STOPWORDS_EN,
                   toks: Column | None = None) -> Column:
    t = toks if toks is not None else tokens(text)
    sw = F.array(*[F.lit(w) for w in stopwords])
    n_sw = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return F.when(F.size(t) > 0,
                  n_sw.cast("double") / F.size(t)).otherwise(F.lit(0.0))


def fingerprint(text: Column | str, toks: Column | None = None) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowered text.

    With ``toks`` (a materialized ``tokens(text)`` column) the normalized
    string is rebuilt as ``array_join(toks, ' ')`` instead of a second
    regex pass — bit-identical because ``split`` (limit -1) keeps the
    leading/trailing empty tokens that ``trim`` (space-only) leaves
    behind for tab/newline edges, and joining empties with ' ' restores
    exactly the single space ``regexp_replace(…, '\\s+', ' ')`` emits."""
    if toks is not None:
        return F.md5(F.array_join(toks, " "))
    norm = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.md5(norm)


#: BPE-ish tokenizer regex (GPT-2 shape, lookahead-free so it runs
#: identically under Java regex and RE2): contraction suffixes, space-
#: prefixed letter runs, digit runs, punctuation runs, whitespace runs.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count(text: Column | str) -> Column:
    """Number of BPE-style pre-tokenizer matches — the cheap, JVM-side
    stand-in for a real BPE vocab count (proportional for natural text).
    """
    return F.regexp_count(text if isinstance(text, Column) else F.col(text),
                          F.lit(BPE_PATTERN))


# Rolling-hash fingerprinting (winnowing, MOSS-style): polynomial rolling
# hash over token k-grams, then the min hash of every w-gram window —
# guarantees any shared token run of length >= k + w - 1 yields a shared
# fingerprint. All arithmetic stays under 2^63 (token hashes < P ~ 1e9,
# combine peak ~ 1.7e13), so BIGINT math is identical in Spark and DuckDB.
WINNOW_P = 1_000_000_007
WINNOW_B = 131


def token_hash_expr(toks_col: str) -> str:
    """SQL expr: per-token 60-bit md5-prefix hash reduced mod WINNOW_P."""
    return (f"transform({toks_col}, t -> "
            f"cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)"
            f" % {WINNOW_P})")


def kgram_hash_expr(th_col: str, k: int = 3) -> str:
    """SQL expr: polynomial combine of ``k`` consecutive token hashes
    (0-based Spark array subscripts). Empty array when fewer than k."""
    poly = f"{th_col}[i]"
    for j in range(1, k):
        poly = f"({poly} * {WINNOW_B} + {th_col}[i + {j}])"
    return (f"if(size({th_col}) >= {k}, "
            f"transform(sequence(0, size({th_col}) - {k}), "
            f"i -> {poly} % {WINNOW_P}), "
            f"cast(array() as array<bigint>))")


def winnow_expr(g_col: str, w: int = 4) -> str:
    """SQL expr: distinct min-hash per sliding window of ``w`` k-gram
    hashes (1-based ``slice``) — the winnowing fingerprint set."""
    return (f"if(size({g_col}) >= {w}, "
            f"array_distinct(transform(sequence(1, size({g_col}) - {w} + 1), "
            f"i -> array_min(slice({g_col}, i, {w})))), "
            f"cast(array() as array<bigint>))")


def let_expr(binding: str, var: str, body: str) -> str:
    """SQL let-binding: evaluate ``binding`` ONCE, expose it as lambda
    variable ``var`` inside ``body`` — ``transform(array(b), v -> body)[0]``.

    Why this exists: CollapseProject inlines withColumn chains, and an
    inlined sub-expression that appears inside a per-element lambda (e.g.
    ``slice(g, i, w)``) is re-evaluated for EVERY element — turning a
    linear pipeline into O(n^3) per row (observed: a 0.8 s winnowing
    stage became a multi-minute hang once a downstream explode triggered
    the collapse). A lambda variable is a bound VALUE, so the optimizer
    can inline the whole tree and evaluation still runs each stage once.
    """
    return f"transform(array({binding}), {var} -> {body})[0]"


def winnow_fingerprints_expr(toks_col: str, k: int = 3, w: int = 4) -> str:
    """The full rolling-hash winnowing pipeline as ONE inline-proof
    expression: token hashes → k-gram polynomial hashes → windowed min —
    each intermediate let-bound so it is computed exactly once per row."""
    return let_expr(
        token_hash_expr(toks_col), "th",
        let_expr(kgram_hash_expr("th", k), "g", winnow_expr("g", w)))


def lang_scores(text: Column | str,
                toks: Column | None = None) -> dict[str, Column]:
    """Per-language marker-token counts (the n-gram-frequency heuristic
    reduced to marker unigrams — deterministic and SQL-twin-able)."""
    t = toks if toks is not None else tokens(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(t, lambda x: F.array_contains(arr, x)))
    return out


def _let_col(binding: Column, fn) -> Column:
    """Column-level let-binding (see ``let_expr``): evaluate ``binding``
    once, pass it to ``fn`` as a bound lambda variable. Higher-order
    lambdas run interpreted (no codegen CSE), so without this every
    reference re-evaluates the whole sub-tree."""
    return F.transform(F.array(binding), fn).getItem(0)


def detect_lang(text: Column | str, default: str = "und",
                toks: Column | None = None) -> Column:
    """argmax over lang_scores with deterministic tiebreak (lang order
    as declared); all-zero → ``default``.

    The scores array and its max are let-bound so each per-language
    marker filter runs exactly ONCE per row — the naive when-chain
    argmax re-evaluated every interpreted filter O(langs) times and
    dominated document_profile's runtime."""
    scores = lang_scores(text, toks=toks)
    scores_arr = F.array(*scores.values())
    langs_arr = F.array(*[F.lit(lang) for lang in scores])
    return _let_col(scores_arr, lambda sc: _let_col(
        F.array_max(sc), lambda mx:
        F.when(mx > 0, F.element_at(
            langs_arr, F.array_position(sc, mx).cast("int")))
         .otherwise(F.lit(default))))


# --- PII scrubbing ----------------------------------------------------------

#: Java-regex AND RE2-compatible patterns (no backrefs, no lookaround),
#: so the same strings drive Spark expressions and the DuckDB oracle.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ip": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def scrub_pii(text: Column | str, replacement: str = "[PII]") -> Column:
    """Mask every PII_PATTERNS match — emails, NANP-style phone
    numbers, IPv4 addresses — with ``replacement``. Stacked
    ``regexp_replace`` calls, all JVM-side codegen, applied in dict
    order (email, phone, ip). Note ``user@10.0.0.1``-style hosts do NOT
    match the email pattern (it requires an alphabetic TLD); only the
    IP part is masked, leaving the ``user@`` prefix.

    The default mask is non-empty on purpose: with ``replacement=""``
    a deletion can splice adjacent digits into a new, now-unscrubbed
    phone/IP-shaped string (each pattern runs as one fixed pass, not to
    fixpoint). Pass ``""`` only where the caller measures removed
    characters and the corpus is known splice-free."""
    col = F.col(text) if isinstance(text, str) else text
    for pat in PII_PATTERNS.values():
        col = F.regexp_replace(col, pat, replacement)
    return col
