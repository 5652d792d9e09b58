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


# ---------------------------------------------------------------------------
# SimHash on an md5-derived 64-bit token hash — arithmetic both engines share
# (Catalyst and DuckDB evaluate the identical nibble decode), so the driver
# oracle is exact. Bit b (0 = LSB) of a token's hash = bit (b % 4) of the
# md5-hex nibble at 1-based position 16 - b DIV 4.

_HEX = '0123456789abcdef'
_MIN_BIGINT = '(-9223372036854775807 - 1)'


def _simhash_pows_spark() -> str:
    vals = [str(1 << b) + 'L' for b in range(63)]
    vals.append('(-9223372036854775807L - 1L)')
    return 'array(' + ', '.join(vals) + ')'


def _nibble_sql(h: str, i: str, dialect: str = 'spark') -> str:
    """Hex digit value of char i (1-based) of hex string h — branch-free
    ascii arithmetic: '0'-'9' → a-48, 'a'-'f' → a-87
    (= a - 48 - 39·(a intdiv 97)). Only the two one-byte reads repeat; pass
    a PRE-HASHED hex variable for ``h`` (HOF lambdas are interpreted — no
    CSE — so an inline md5 here would re-hash per digit)."""
    idiv = 'DIV' if dialect == 'spark' else '//'
    return f'(ascii(substr({h}, {i}, 1)) - 48 - '\
           f'39 * (ascii(substr({h}, {i}, 1)) {idiv} 97))'


def simhash_spark_expr(text_col: str) -> str:
    """Single-pass Catalyst expression: words → per-token md5 (hoisted:
    exactly one md5 per token — lambdas are interpreted, an inline md5
    would re-hash per digit) → nibble array → 64 signed bit-sums (one
    fold) → packed int64. Zero Python, zero shuffles."""
    words = f"split(trim({text_col}), '\\\\s+')"
    hexes = f'transform({words}, w -> md5(w))'
    digs = (f'transform({hexes}, h -> transform(sequence(1, 16), '
            f"i -> {_nibble_sql('h', 'i')}))")
    sums = (f'aggregate({digs}, '
            'transform(sequence(0, 63), b -> 0), '
            '(acc, dd) -> zip_with(acc, sequence(0, 63), (a, b) -> a + '
            '(CASE WHEN (shiftright(element_at(dd, CAST(16 - b DIV 4 AS INT)), '
            'b % 4) & 1) = 1 THEN 1 ELSE -1 END)))')
    pack = (f'aggregate(zip_with({sums}, sequence(0, 63), (s, b) -> '
            f'CASE WHEN s > 0 THEN element_at({_simhash_pows_spark()}, '
            'CAST(b + 1 AS INT)) ELSE 0L END), 0L, (acc, x) -> acc | x)')
    return pack


def simhash_duckdb_sql(table: str, text_col: str = 'text',
                       id_col: str = 'doc_id') -> str:
    """Full DuckDB statement computing the identical simhash per row."""
    words = f"string_split_regex(trim({text_col}), '\\s+')"
    hexes = f'list_transform({words}, w -> md5(w))'
    digs = (f'list_transform({hexes}, h -> list_transform('
            'generate_series(1, 16), '
            f"i -> {_nibble_sql('h', 'i', 'duckdb')}))")
    sums = ('list_transform(generate_series(0, 63), b -> '
            'list_sum(list_transform(digs, dd -> '
            'CASE WHEN (dd[CAST(16 - b // 4 AS INT)] >> (b % 4)) & 1 = 1 '
            'THEN 1 ELSE -1 END)))')
    pows = ', '.join([str(1 << b) for b in range(63)] + [_MIN_BIGINT])
    pack = ('CAST(list_aggregate(list_transform(generate_series(1, 64), '
            'i -> CASE WHEN sums[i] > 0 THEN pows[i] ELSE 0 END), '
            "'bit_or') AS BIGINT)")
    return (f'WITH d AS (SELECT {id_col}, {digs} AS digs FROM {table}), '
            f's AS (SELECT {id_col}, {sums} AS sums, '
            f'[{pows}]::BIGINT[] AS pows FROM d) '
            f'SELECT {id_col}, {pack} AS simhash FROM s')


def analyze(df: DataFrame, text_col: str = 'text',
            id_col: str = 'doc_id') -> DataFrame:
    """One-pass text profile: tokens, predicted lang, quality."""
    return df.select(
        id_col,
        F.expr(token_count_sql(text_col)).cast('long').alias('n_tokens'),
        F.expr(lang_id_sql(text_col)).alias('lang_pred'),
        F.expr(quality_sql(text_col)).alias('quality'),
    )

BPE_PRETOKEN_PATTERN = (
    "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\\sa-zA-Z0-9']+|\\s+")
"""GPT-2-style pre-tokenization regex, simplified to ASCII classes and no
lookahead (public pattern shape from the GPT-2 BPE paper/code): contraction
suffixes, space-prefixed letter runs, digit runs, punctuation runs,
residual whitespace. ASCII classes + no lookahead keep Java-regex (Spark)
and RE2 (DuckDB) semantics identical; both engines scan leftmost-first."""


def bpe_token_count_sql(text_col: str, dialect: str = 'spark') -> str:
    """Count of BPE-ish pre-tokens — the subword-tokenizer-shaped budget
    estimate a training pipeline tracks next to the whitespace count.
    Identical match semantics in both engines (see BPE_PRETOKEN_PATTERN);
    only the string-literal escaping differs per dialect."""
    if dialect == 'duckdb':
        lit = BPE_PRETOKEN_PATTERN.replace("'", "''")
        return f"len(regexp_extract_all({text_col}, '{lit}'))"
    lit = BPE_PRETOKEN_PATTERN.replace('\\', '\\\\').replace("'", "\\'")
    return f"regexp_count({text_col}, '{lit}')"


# ---------------------------------------------------------------------------
# HTML → visible text extraction — the north rule's per-row invariant
# surface ("extracted text per url stays byte-identical"). Pure shared SQL
# (Catalyst ⇄ DuckDB): deterministic by construction, so the same html
# bytes extract to the same text bytes on every engine, partition layout
# and executor count. Semantics (documented, fixed): script/style blocks
# drop, remaining tags become spaces, the 5 core entities decode
# (&amp; last, per the standard), whitespace collapses, ends trim.

def html_text_sql(html_col: str, dialect: str = 'spark') -> str:
    """Extraction expression over a STRING html column/expression."""
    if dialect == 'duckdb':
        def rr(col, pat, rep):
            return f"regexp_replace({col}, '{pat}', '{rep}', 'g')"
        ws = '\\s+'
    else:
        def rr(col, pat, rep):
            return f"regexp_replace({col}, '{pat}', '{rep}')"
        ws = '\\\\s+'
    x = rr(html_col, '(?s)<(script|style)[^>]*>.*?</(script|style)>', ' ')
    x = rr(x, '<[^>]*>', ' ')
    for ent, ch in (('&lt;', '<'), ('&gt;', '>'), ('&quot;', '"'),
                    ('&#39;', "''"), ('&amp;', '&')):
        x = f"replace({x}, '{ent}', '{ch}')"
    return f"trim({rr(x, ws, ' ')})"


def canonical_url_sql(col: str, dialect: str = 'spark') -> str:
    """URL canonicalization — the crawl-frontier / exact-URL-dedup
    normalizer (same role as e.g. Nutch's BasicURLNormalizer, public
    spec: RFC 3986 §6 normalization, minus dot-segment resolution):

    - drop the fragment (``#…``),
    - lowercase scheme and host,
    - strip the scheme's default port (``:80`` for http, ``:443`` for
      https),
    - empty path → ``/``,
    - sort query parameters (``?b=2&a=1`` == ``?a=1&b=2``; a bare ``?``
      is dropped); path case and param repeats are preserved,
    - schemeless input (relative / protocol-relative hrefs) passes
      through unchanged except the fragment drop — there is no
      authority to normalize and mangling it would corrupt the link
      graph.

    One nested string expression per row, whole-stage codegen on the
    Spark side; the DuckDB dialect swaps only the array function names
    (split/array_sort/array_join ↔ string_split/list_sort/
    array_to_string), so both engines canonicalize byte-identically —
    the oracle pairing trick used across this engine.
    """
    if dialect == 'spark':
        def sort_join(q):
            return f"array_join(array_sort(split({q}, '&')), '&')"
    else:
        def sort_join(q):
            return f"array_to_string(list_sort(string_split({q}, '&')), '&')"
    nofrag = f"regexp_replace({col}, '#.*$', '')"
    scheme = (f"lower(regexp_extract({nofrag}, "
              f"'^([A-Za-z][A-Za-z0-9+.-]*)://', 1))")
    hostport = (f"lower(regexp_extract({nofrag}, "
                f"'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))")
    host = (f"(CASE WHEN {scheme} = 'http' "
            f"THEN regexp_replace({hostport}, ':80$', '') "
            f"WHEN {scheme} = 'https' "
            f"THEN regexp_replace({hostport}, ':443$', '') "
            f"ELSE {hostport} END)")
    path = (f"regexp_extract({nofrag}, "
            f"'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)")
    path_norm = f"(CASE WHEN {path} = '' THEN '/' ELSE {path} END)"
    # Spark unescapes backslashes inside SQL string literals, DuckDB does
    # not — same split as every shared regex in this engine ('\\s+' pair)
    qpat = "'\\\\?(.*)$'" if dialect == 'spark' else "'\\?(.*)$'"
    query = f"regexp_extract({nofrag}, {qpat}, 1)"
    query_part = (f"(CASE WHEN {query} = '' THEN '' "
                  f"ELSE concat('?', {sort_join(query)}) END)")
    # schemeless input (relative hrefs, protocol-relative //host/..,
    # mailto-less fragments a crawl emits constantly) has no authority
    # to normalize — pass it through with only the fragment dropped,
    # instead of mangling it into '://…'
    return (f"(CASE WHEN {scheme} = '' THEN {nofrag} "
            f"ELSE concat({scheme}, '://', {host}, {path_norm}, "
            f'{query_part}) END)')


def extract_links_sql(html_col: str, dialect: str = 'spark') -> str:
    """ARRAY of href targets in ``html`` — the link-extraction step that
    turns a crawl into a web graph (explode → :func:`canonical_url_sql`
    → host → edge list feeds the PageRank operator). The builtin is
    spelled ``regexp_extract_all`` in BOTH engines and the pattern uses
    no escapes, so one string serves the query and its oracle; the
    ``dialect`` arg is kept for signature symmetry with the rest of the
    module."""
    return f'regexp_extract_all({html_col}, \'href="([^"]+)"\', 1)'


# two-label public suffixes the extractor recognises (a representative
# subset of the public-suffix list, baked in — the real list is a data
# file a deployment broadcast-joins; the ALGORITHM is what's tested)
PUBLIC_SUFFIXES_2 = ('co.uk', 'com.au', 'co.jp', 'com.br', 'co.in',
                     'gov.uk', 'ac.uk', 'or.jp', 'net.au', 'org.uk')


def registrable_domain_sql(host_col: str, dialect: str = 'spark') -> str:
    """Registrable domain (eTLD+1) of a lowercase hostname: the last two
    labels, or the last THREE when the last two are a known two-label
    public suffix (``a.b.co.uk`` → ``b.co.uk``, ``a.b.example.com`` →
    ``example.com``) — the grouping key for domain-level corpus stats,
    per-site quotas and host-level dedup. Pure regex CASE, shared
    between engines (Spark's SQL parser unescapes backslashes in string
    literals, DuckDB's does not — same split as every shared regex
    here)."""
    bs = '\\\\' if dialect == 'spark' else '\\'
    alts = '|'.join(s.replace('.', f'{bs}.') for s in PUBLIC_SUFFIXES_2)
    lab = f'[^.]+{bs}.'
    suf3 = f"'({lab}(?:{alts}))$'"
    suf2 = f"'({lab}[^.]+)$'"
    return (f'(CASE WHEN regexp_extract({host_col}, {suf3}, 1) <> \'\' '
            f'THEN regexp_extract({host_col}, {suf3}, 1) '
            f'ELSE regexp_extract({host_col}, {suf2}, 1) END)')


def robots_filter(urls: DataFrame, rules: DataFrame,
                  url_col: str = 'url', host_col: str = 'host',
                  prefix_col: str = 'prefix',
                  allow_col: str = 'allow') -> DataFrame:
    """Robots-rules URL filtering with LONGEST-MATCH precedence (the
    documented REP semantics: the most specific matching rule wins;
    allow beats disallow on equal length; no matching rule → allowed) —
    the crawl-frontier admission filter.

    ``rules``: one row per (host, path-prefix, allow BOOLEAN). The join
    is an equi-join on host (the natural shuffle key — a host's rule
    set is small, so per-host fan-out is bounded), prefix match and
    precedence are Catalyst expressions (``startswith``, one window by
    (url) over match length), and unmatched urls come back via the
    left join's NULL branch. At web scale: rules tables are tiny
    relative to the frontier — mark the rules side
    ``F.broadcast(rules)`` at the call site and the shuffle disappears
    entirely.

    Output: the url rows plus ``allowed BOOLEAN``.
    """
    from pyspark.sql.window import Window
    path = F.expr(
        f"regexp_extract({url_col}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
        f"([^#]*)', 1)")
    u = urls.withColumn('_host', F.expr(
        f"lower(regexp_extract({url_col}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)', 1))")) \
        .withColumn('_path', F.when(path == '', '/').otherwise(path))
    r = rules.select(F.col(host_col).alias('_host'),
                     F.col(prefix_col).alias('_prefix'),
                     F.col(allow_col).alias('_allow'))
    j = (u.join(r, '_host', 'left')
          .withColumn('_hit', F.expr('startswith(_path, _prefix)')))
    w = Window.partitionBy(url_col).orderBy(
        F.when(F.col('_hit'), F.length('_prefix')).otherwise(-1).desc(),
        F.col('_allow').desc())
    best = (j.withColumn('_rn', F.row_number().over(w))
             .where('_rn = 1')
             .withColumn('allowed',
                         F.when(F.col('_hit').isNull()
                                | ~F.col('_hit'), F.lit(True))
                          .otherwise(F.col('_allow'))))
    return best.drop('_host', '_path', '_prefix', '_allow', '_hit', '_rn')


def frontier_schedule(urls: DataFrame, url_col: str = 'url',
                      priority_col: str | None = None,
                      host_rates: DataFrame | None = None,
                      host_col: str = 'host', rate_col: str = 'rate',
                      default_rate: int = 1) -> DataFrame:
    """Politeness-aware crawl-frontier scheduling (the Nutch/Heritrix
    fetch-list generator): each URL is assigned a ``wave`` (which fetch
    round it runs in) and a ``slot`` (its position inside the round)
    such that no host ever has more than its per-wave ``rate`` URLs in
    one wave. Ordering inside a host is by ``priority_col`` DESC when
    given (ties, and the no-priority case, break by url ASC — fully
    deterministic, rerun-stable).

    ``host_rates``: optional (host, rate) table of per-host budgets
    (e.g. from crawl-delay directives); hosts absent from it get
    ``default_rate``. Rate tables are tiny next to a frontier — pass
    ``F.broadcast(host_rates)`` at the call site and the join costs no
    shuffle.

    Output: url columns + ``host``, ``rank_in_host`` (1-based),
    ``wave``, ``slot`` (both 0-based).

    Scale shape (100 TB frontier): ONE hash shuffle on host + a per-host
    sort (the window). A mega-host sorts its own partition only — skew
    degrades that host's sort, never a cross-host barrier; there is no
    global wave re-balancing pass, which keeps the operator one-shuffle
    (capacity smoothing across hosts is the dispatcher's job downstream).
    """
    from pyspark.sql.window import Window
    if default_rate < 1:
        raise ValueError(f'default_rate must be >= 1: {default_rate}')
    u = urls.withColumn('host', F.expr(
        f"lower(regexp_extract({url_col}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)', 1))"))
    if host_rates is not None:
        r = host_rates.select(F.col(host_col).alias('host'),
                              F.col(rate_col).alias('_rate'))
        u = (u.join(r, 'host', 'left')
             .withColumn('_rate', F.coalesce('_rate',
                                             F.lit(default_rate))))
    else:
        u = u.withColumn('_rate', F.lit(default_rate))
    order = ([F.col(priority_col).desc()] if priority_col else []) \
        + [F.col(url_col).asc()]
    w = Window.partitionBy('host').orderBy(*order)
    return (u.withColumn('rank_in_host', F.row_number().over(w))
            .withColumn('wave', F.expr('(rank_in_host - 1) DIV _rate'))
            .withColumn('slot', F.expr('(rank_in_host - 1) % _rate'))
            .drop('_rate'))


def anchor_terms(pages: DataFrame, html_col: str = 'html',
                 k: int = 3) -> DataFrame:
    """Anchor-text aggregation: the terms other pages use in links TO a
    host — the classic off-page relevance signal (anchor text indexing,
    Brin & Page 1998) and the label source for weak supervision over a
    crawl. For each link target host, tokenize every anchor's inner
    text across the corpus and keep the top-``k`` terms by count (ties →
    lexicographically smallest term).

    Output: ``(dst_host, term, n, rnk)`` with ``n`` the corpus-wide
    occurrence count of ``term`` in anchors pointing at ``dst_host``.

    Extraction is two-stage because ``regexp_extract_all`` captures ONE
    group per match in Spark and DuckDB alike: first the whole
    ``<a href="...">text</a>`` snippet, then href and inner text out of
    the exploded snippet — every pattern is escape-free shared SQL, so
    the DuckDB oracle runs the identical pipeline.

    Scale shape (100 TB): explode snippets → explode terms → ONE
    partial-agg groupBy (dst_host, term) → per-host window top-k that
    reuses the same hash partitioning. A mega-host (every page links to
    it) costs a sorted scan of ITS terms only; no global sort, nothing
    driver-side.
    """
    from pyspark.sql.window import Window
    snip = f'regexp_extract_all({html_col}, \'(<a href="[^"]+"[^>]*>[^<]*</a>)\', 1)'
    href = 'regexp_extract(s, \'href="([^"]+)"\', 1)'
    atext = "regexp_extract(s, '>([^<]*)</a>', 1)"
    canon = canonical_url_sql('u', 'spark')
    terms = (pages
             .select(F.explode(F.expr(snip)).alias('s'))
             .select(F.expr(href).alias('u'), F.expr(atext).alias('t'))
             .select(F.expr(canon).alias('canon'), 't')
             .select(F.expr("regexp_extract(canon, "
                            "'^https?://([^/]+)/', 1)").alias('dst_host'),
                     F.explode(F.split(F.trim('t'), r'\s+')).alias('term'))
             .where("term <> ''"))
    counts = terms.groupBy('dst_host', 'term').agg(
        F.count('*').alias('n'))
    w = Window.partitionBy('dst_host').orderBy(
        F.col('n').desc(), F.col('term').asc())
    return (counts.withColumn('rnk', F.row_number().over(w))
            .where(F.col('rnk') <= k))


def redact_pii_sql(text_col: str, dialect: str = 'spark') -> dict:
    """PII scrub expressions (the Dolma/CCNet pre-training redaction
    pass): emails → ``<EMAIL>``, IPv4 literals → ``<IP>``, long digit
    runs (≥ 9 — phone/account shaped) → ``<NUM>``. Returns a dict of SQL
    expressions over ``text_col``::

        {'clean': <redacted text>, 'n_emails': ..., 'n_ips': ..., 'n_longnums': ...}

    Stages apply in a FIXED order (emails, then IPs, then digit runs),
    and each count is taken on that stage's input — so an IP inside an
    already-redacted email is neither counted nor double-redacted, and
    Spark (Java regex) and DuckDB (RE2) agree exactly: the patterns use
    only the class/quantifier/word-boundary subset with identical
    semantics in both engines. Pure JVM/codegen — no Python in the path.
    """
    if dialect == 'duckdb':
        def rr(col, pat, rep):
            return f"regexp_replace({col}, '{pat}', '{rep}', 'g')"

        def rc(col, pat):
            return f"CAST(len(regexp_extract_all({col}, '{pat}')) AS BIGINT)"
        bs = '\\'
    else:
        def rr(col, pat, rep):
            return f"regexp_replace({col}, '{pat}', '{rep}')"

        def rc(col, pat):
            return f"CAST(regexp_count({col}, '{pat}') AS BIGINT)"
        bs = '\\\\'
    email = f'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+{bs}.[A-Za-z][A-Za-z]+'
    ip = (f'{bs}b{bs}d{{1,3}}{bs}.{bs}d{{1,3}}{bs}.{bs}d{{1,3}}'
          f'{bs}.{bs}d{{1,3}}{bs}b')
    num = f'{bs}b{bs}d{{9,}}{bs}b'
    s1 = rr(text_col, email, '<EMAIL>')
    s2 = rr(s1, ip, '<IP>')
    s3 = rr(s2, num, '<NUM>')
    return {
        'clean': s3,
        'n_emails': rc(text_col, email),
        'n_ips': rc(s1, ip),
        'n_longnums': rc(s2, num),
    }


def redact_pii(df: DataFrame, text_col: str = 'text',
               id_col: str = 'doc_id') -> DataFrame:
    """Apply :func:`redact_pii_sql` → (id, clean_text, n_emails, n_ips,
    n_longnums). One projection, whole-stage codegen, zero shuffles —
    at 100 TB this is a pure map over the corpus scan."""
    e = redact_pii_sql(text_col, 'spark')
    return df.select(
        F.col(id_col),
        F.expr(e['clean']).alias('clean_text'),
        F.expr(e['n_emails']).alias('n_emails'),
        F.expr(e['n_ips']).alias('n_ips'),
        F.expr(e['n_longnums']).alias('n_longnums'))


def redact_pii_oracle_sql(corpus_cte: str, text_col: str = 'text',
                          id_col: str = 'doc_id') -> str:
    """DuckDB twin of :func:`redact_pii` (RE2 'g'-flag replaces)."""
    e = redact_pii_sql(text_col, 'duckdb')
    return (f'WITH corpus AS ({corpus_cte}) '
            f"SELECT {id_col}, {e['clean']} AS clean_text, "
            f"{e['n_emails']} AS n_emails, {e['n_ips']} AS n_ips, "
            f"{e['n_longnums']} AS n_longnums FROM corpus")


def crawl_diff(old: DataFrame, new: DataFrame, url_col: str = 'url',
               text_col: str = 'text') -> DataFrame:
    """Crawl-over-crawl change feed: FULL OUTER join of two crawl
    snapshots on ``url_col`` with content comparison by xxhash64 of the
    extracted text::

        (url, status)   -- status ∈ 'added' | 'removed' | 'changed' | 'same'

    the per-URL delta a recrawl scheduler and an incremental indexer
    both consume (added/changed → refetch queue; removed → tombstone).

    Scale shape: each side reduces to a NARROW (url, hash) projection
    before the join — the text never shuffles; the join is ONE exchange
    per side on url (bucket both crawls by url at write time and it
    becomes co-located). Duplicate urls within one crawl must be
    resolved upstream (latest-wins read, :meth:`SnapshotTable.read`
    with ``dedupe_keys``); the join is 1:1 by contract.
    """
    def h(df, tag):
        return df.select(F.col(url_col).alias('url'),
                         F.xxhash64(F.col(text_col)).alias(f'h_{tag}'))
    j = h(old, 'old').join(h(new, 'new'), 'url', 'full_outer')
    return j.select(
        'url',
        F.when(F.col('h_old').isNull(), F.lit('added'))
         .when(F.col('h_new').isNull(), F.lit('removed'))
         .when(F.col('h_old') == F.col('h_new'), F.lit('same'))
         .otherwise(F.lit('changed')).alias('status'))


def crawl_diff_oracle_sql(old_cte: str, new_cte: str,
                          url_col: str = 'url',
                          text_col: str = 'text') -> str:
    """DuckDB twin of :func:`crawl_diff` — compares the TEXT directly
    (exact truth; the engine's xxhash64 equality is its collision-free
    proxy, cross-checked by the driver gate at test scale)."""
    return (f'WITH o AS ({old_cte}), n AS ({new_cte}) '
            f'SELECT COALESCE(o.{url_col}, n.{url_col}) AS url, '
            f'CASE WHEN o.{url_col} IS NULL THEN \'added\' '
            f'WHEN n.{url_col} IS NULL THEN \'removed\' '
            f'WHEN o.{text_col} = n.{text_col} THEN \'same\' '
            f'ELSE \'changed\' END AS status '
            f'FROM o FULL OUTER JOIN n ON o.{url_col} = n.{url_col}')
