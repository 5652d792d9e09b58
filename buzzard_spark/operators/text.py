"""Text-analysis operators: language-ID, quality scoring, token counting,
fingerprinting. Every expression is shared SQL (Catalyst ⇄ DuckDB) so the
driver oracles are exact; nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from buzzard_spark.functions.sqlgen import dlit

# marker words per language for the n-gram heuristic; precedence = listed
# order on ties (deterministic)
LANG_MARKERS = {
    'en': ('the', 'and', 'of'),
    'fr': ('le', 'la', 'et'),
    'de': ('der', 'und', 'das'),
    'es': ('el', 'los', 'y'),
    'pt': ('de', 'os', 'em'),
}

STOPWORDS = ('the', 'a', 'of', 'and')


def _count_word_sql(text_col: str, word: str) -> str:
    """# occurrences of ` word ` in ` text ` (space-padded, non-overlapping)."""
    pad = f"concat(' ', {text_col}, ' ')"
    needle = f"' {word} '"
    # replace with a shorter pad keeps doubled spaces from hiding matches
    return (f'CAST((length({pad}) - '
            f"length(replace({pad}, {needle}, ' '))) AS BIGINT) "
            f'/ {len(word) + 1}')


def lang_score_sql(text_col: str, lang: str) -> str:
    return '(' + ' + '.join(
        f'({_count_word_sql(text_col, w)})' for w in LANG_MARKERS[lang]) + ')'


def lang_id_sql(text_col: str) -> str:
    """Predicted language = first language (in LANG_MARKERS order) whose
    marker score equals the maximum."""
    scores = {lang: lang_score_sql(text_col, lang) for lang in LANG_MARKERS}
    greatest = 'GREATEST(' + ', '.join(scores.values()) + ')'
    whens = ' '.join(
        f"WHEN ({scores[lang]}) = _mx THEN '{lang}'" for lang in LANG_MARKERS)
    # inline _mx by textual substitution (no lateral alias in either engine)
    return ('(CASE ' + whens + " ELSE 'und' END)").replace('_mx', greatest)


def token_count_sql(text_col: str, dialect: str = 'spark') -> str:
    """Whitespace token count; the split builtin differs by engine but the
    value is identical."""
    if dialect == 'duckdb':
        return f"length(string_split_regex(trim({text_col}), '\\s+'))"
    return f"size(split(trim({text_col}), '\\\\s+'))"


def quality_sql(text_col: str, dialect: str = 'spark') -> str:
    """Quality score in [0, ~2]: mean-token-length term + stopword-ratio
    term — deterministic double arithmetic, identical in both engines."""
    ntok = f'CAST({token_count_sql(text_col, dialect)} AS DOUBLE)'
    nchar = f'CAST(length({text_col}) AS DOUBLE)'
    stop = '(' + ' + '.join(
        f'({_count_word_sql(text_col, w)})' for w in STOPWORDS) + ')'
    mean_len = f'({nchar} / {ntok})'
    stop_ratio = f'(CAST({stop} AS DOUBLE) / {ntok})'
    return (f'({mean_len} / {dlit(8.0)} + {stop_ratio} * {dlit(2.0)})')


def analyze(df: DataFrame, text_col: str = 'text',
            id_col: str = 'doc_id') -> DataFrame:
    """One-pass text profile: tokens, predicted lang, quality."""
    return df.select(
        id_col,
        F.expr(token_count_sql(text_col)).cast('long').alias('n_tokens'),
        F.expr(lang_id_sql(text_col)).alias('lang_pred'),
        F.expr(quality_sql(text_col)).alias('quality'),
    )
