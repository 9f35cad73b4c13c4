"""Text analysis operators for LLM-data pipelines (SURVEY.md §7.4).

Language-ID (marker-word scoring), quality scoring (length/punct/
stopword ratios), token counting (whitespace + BPE-ish regex), and
document fingerprinting (md5 canonical + polynomial rolling hash) over
the `documents` table.

All of it is built-in Catalyst expressions — higher-order array
functions (`transform`/`filter`/`aggregate`), `regexp_extract_all`,
`md5` — zero Python UDFs, so at 100 TB these are narrow,
whole-stage-codegen'd map stages with no shuffle.

Cross-engine portability decisions:
- Portable 60-bit token hash: `conv(substr(md5(t),1,15),16,10)` in
  Spark ≡ `CAST('0x'||substring(md5(t),1,15) AS BIGINT)` in DuckDB
  (Spark's xxhash64/murmur aren't reproducible elsewhere).
- The rolling fingerprint folds `(acc*B + h) % p` left-to-right with
  p = 2^31-1 so every intermediate stays < 2^62 (no bigint overflow —
  Spark 4 runs ANSI mode).
- The langid heuristic is DETERMINISTIC scoring of marker-word counts
  with first-candidate tie-break; on the synthetic corpus (English-ish
  word salad for every `lang` label) it is graded on plumbing +
  oracle parity, not real-world accuracy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import balanced, load_table

#: polynomial rolling-hash parameters (shared with oracle SQL)
FP_P = 2_147_483_647  # 2^31 - 1
FP_B = 1_000_003

#: marker words per language, scored in this candidate order
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "of", "and", "to"]),
    ("de", ["der", "die", "das", "und", "ist"]),
    ("es", ["el", "la", "que", "los", "y"]),
    ("fr", ["le", "les", "des", "et", "est"]),
]

BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_PATTERN = r"[.,;:!?]"


def tokens_expr(text: Column) -> Column:
    """Whitespace tokenization (both engines split identically)."""
    return F.split(F.trim(text), r"\s+")


def portable_hash60(col: Column) -> Column:
    """60-bit deterministic hash reproducible in any SQL engine:
    first 15 hex chars of md5, parsed as an integer."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def portable_hash60_sql(expr: str) -> str:
    return f"CAST('0x' || substring(md5({expr}), 1, 15) AS BIGINT)"


def _marker_count(tokens: Column, markers: list[str]) -> Column:
    return F.size(F.filter(tokens, lambda t: F.lower(t).isin(*markers)))


def langid_expr(text: Column) -> Column:
    """argmax over marker-word counts, ties broken by candidate order;
    'und' when no marker matches."""
    toks = tokens_expr(text)
    scores = [_marker_count(toks, m) for _, m in LANG_MARKERS]
    pairs = [
        F.struct(
            (-scores[i]).alias("neg_score"),
            F.lit(i).alias("prio"),
            F.lit(lang).alias("lang"),
        )
        for i, (lang, _) in enumerate(LANG_MARKERS)
    ]
    best = F.array_min(F.array(*pairs))
    total = scores[0]
    for s in scores[1:]:
        total = total + s
    return F.when(total == 0, F.lit("und")).otherwise(best["lang"])


def langid_sql(text: str) -> str:
    """DuckDB mirror of `langid_expr` (same scores, same tie-break)."""
    toks = f"regexp_split_to_array(trim({text}), '\\s+')"
    counts = []
    for _, markers in LANG_MARKERS:
        lst = ", ".join(f"'{m}'" for m in markers)
        counts.append(f"len(list_filter({toks}, t -> lower(t) IN ({lst})))")
    c = counts
    langs = [lang for lang, _ in LANG_MARKERS]
    return f"""
      CASE WHEN {c[0]} + {c[1]} + {c[2]} + {c[3]} = 0 THEN 'und'
           WHEN {c[0]} >= {c[1]} AND {c[0]} >= {c[2]} AND {c[0]} >= {c[3]}
             THEN '{langs[0]}'
           WHEN {c[1]} >= {c[2]} AND {c[1]} >= {c[3]} THEN '{langs[1]}'
           WHEN {c[2]} >= {c[3]} THEN '{langs[2]}'
           ELSE '{langs[3]}' END
    """


def text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality/statistics profile + language ID +
    fingerprints — one pass, one projection (`balanced` adds a
    spreading exchange only on under-split single-file sources)."""
    d = balanced(load_table(spark, sf_dir, "documents"))
    text = F.col("text")
    toks = tokens_expr(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    n_punct = F.size(F.regexp_extract_all(text, F.lit(PUNCT_PATTERN), F.lit(0)))
    n_digits = F.size(F.regexp_extract_all(text, F.lit("[0-9]"), F.lit(0)))
    n_bpe = F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0)))
    sum_tok_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    stop_hits = _marker_count(toks, LANG_MARKERS[0][1])
    # ratio arithmetic order is mirrored in TEXT_PROFILE_SQL
    avg_token_len = sum_tok_len / n_tokens
    stopword_ratio = stop_hits / n_tokens
    punct_ratio = n_punct / n_chars
    digit_ratio = n_digits / n_chars
    quality = (
        F.when((n_tokens >= 10) & (n_tokens <= 1000), F.lit(0.4)).otherwise(
            F.lit(0.0)
        )
        + F.when((avg_token_len >= 2.0) & (avg_token_len <= 12.0), F.lit(0.3))
        .otherwise(F.lit(0.0))
        + F.when(stopword_ratio >= 0.05, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(digit_ratio <= 0.2, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    canonical = F.lower(F.regexp_replace(text, r"\s+", " "))
    rolling = F.aggregate(
        F.transform(toks, lambda t: portable_hash60(t) % FP_P),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(FP_B) + h) % F.lit(FP_P),
    )
    return d.select(
        "doc_id",
        "source",
        n_chars.cast("long").alias("n_chars_calc"),
        n_tokens.cast("long").alias("n_tokens"),
        n_bpe.cast("long").alias("n_bpe_tokens"),
        avg_token_len.alias("avg_token_len"),
        stopword_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        quality.alias("quality_score"),
        langid_expr(text).alias("lang_pred"),
        F.md5(canonical).alias("fingerprint_md5"),
        rolling.alias("fingerprint_rolling"),
    )


def top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical distributed text op: explode tokens → count →
    top-20 (deterministic tie-break on the word). Narrow Generate,
    one partial-aggregated shuffle on the word key, TakeOrdered for
    the limit — word skew ('the') is absorbed by map-side combine, so
    no salting needed for counting."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens_expr(F.lower(F.col("text")))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )


TOP_WORDS_SQL = """
SELECT word, count(*) AS n
FROM (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
  FROM documents
)
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word
LIMIT 20
"""


def _sql_counts(text: str) -> dict[str, str]:
    toks = f"regexp_split_to_array(trim({text}), '\\s+')"
    en = ", ".join(f"'{m}'" for m in LANG_MARKERS[0][1])
    return {
        "toks": toks,
        "n_tokens": f"len({toks})",
        "n_chars": f"length({text})",
        "n_punct": f"len(regexp_extract_all({text}, '{PUNCT_PATTERN}'))",
        "n_digits": f"len(regexp_extract_all({text}, '[0-9]'))",
        "n_bpe": f"len(regexp_extract_all({text}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))",
        "sum_tok_len": f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({toks}, t -> CAST(length(t) AS BIGINT))), (a, b) -> a + b)",
        "stop_hits": f"len(list_filter({toks}, t -> lower(t) IN ({en})))",
    }


TEXT_PROFILE_SQL = None  # built below (needs the helper dict)


def _build_text_profile_sql() -> str:
    c = _sql_counts("text")
    avg = f"({c['sum_tok_len']} / {c['n_tokens']})"
    stopr = f"({c['stop_hits']} / {c['n_tokens']})"
    punctr = f"({c['n_punct']} / {c['n_chars']})"
    digitr = f"({c['n_digits']} / {c['n_chars']})"
    quality = f"""(
      (CASE WHEN {c['n_tokens']} >= 10 AND {c['n_tokens']} <= 1000
            THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
       + CASE WHEN {avg} >= 2.0 AND {avg} <= 12.0
              THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
      + CASE WHEN {stopr} >= 0.05 THEN CAST(0.2 AS DOUBLE)
             ELSE CAST(0.0 AS DOUBLE) END
      + CASE WHEN {digitr} <= 0.2 THEN CAST(0.1 AS DOUBLE)
             ELSE CAST(0.0 AS DOUBLE) END
    )"""
    rolling = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({c['toks']}, t -> "
        f"{portable_hash60_sql('t')} % {FP_P})), "
        f"(acc, h) -> (acc * {FP_B} + h) % {FP_P})"
    )
    return f"""
    SELECT doc_id, source,
           CAST({c['n_chars']} AS BIGINT) AS n_chars_calc,
           CAST({c['n_tokens']} AS BIGINT) AS n_tokens,
           CAST({c['n_bpe']} AS BIGINT) AS n_bpe_tokens,
           {avg} AS avg_token_len,
           {stopr} AS stopword_ratio,
           {punctr} AS punct_ratio,
           {digitr} AS digit_ratio,
           {quality} AS quality_score,
           {langid_sql('text')} AS lang_pred,
           md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint_md5,
           {rolling} AS fingerprint_rolling
    FROM documents
    """


TEXT_PROFILE_SQL = _build_text_profile_sql()
