"""Arrow-vectorized pandas UDFs — the ONLY Python that runs on executors.

Each UDF wraps a pure kernel from ``urltools`` / ``textextract``; everything
else in the engine is built-in Spark SQL. Per BASELINE.json ``input_hint``:
vectorized pandas/Arrow UDFs only, no per-row Python UDFs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from playwrightcrawler_spark.functions import textextract, urltools

# --------------------------------------------------------------------------
# URL layer
# --------------------------------------------------------------------------


@pandas_udf(T.StringType())
def canonicalize_url(urls: pd.Series) -> pd.Series:
    """sanitize_url over an Arrow batch (parity kernel P1)."""
    return urls.map(urltools.sanitize_url, na_action="ignore").fillna("")


@pandas_udf(T.BooleanType())
def has_repeated_segments(urls: pd.Series) -> pd.Series:
    """Crawler-trap detector (parity kernel P4). Pre-filter cheap cases in
    SQL first: ``size(split(parse_url(url,'PATH'),'/')) > 3``."""
    return urls.map(
        lambda u: urltools.has_repeated_segments(u) if isinstance(u, str) else False
    )


@pandas_udf(T.StringType())
def url_sha256(urls: pd.Series) -> pd.Series:
    """Reference `_id` parity (sha256 hex). The engine's 64-bit key is
    ``F.xxhash64`` — JVM-side, no UDF."""
    return urls.map(urltools.url_sha256, na_action="ignore")


@pandas_udf(T.ArrayType(T.StringType()))
def directory_tree(urls: pd.Series) -> pd.Series:
    """Parent-directory expansion for open-dir hunting (P16)."""
    return urls.map(urltools.get_directory_tree, na_action="ignore")


_QS_SCHEMA = T.StructType([
    T.StructField("has_query", T.BooleanType()),
    T.StructField("query_variables", T.ArrayType(T.StringType())),
    T.StructField("query_values", T.ArrayType(T.StringType())),
])


@pandas_udf(_QS_SCHEMA)
def parse_query(urls: pd.Series) -> pd.DataFrame:
    """Exact CPython parse_qs decomposition (P14 parity; the pure-SQL
    variant lives in sqlfns.query_* and is cross-checked in tests)."""
    rows = [urltools.parse_query(u) if isinstance(u, str) else (False, [], []) for u in urls]
    return pd.DataFrame(rows, columns=["has_query", "query_variables", "query_values"])


@pandas_udf(T.ArrayType(T.StringType()))
def resolve_links(parent_urls: pd.Series, hrefs: pd.Series) -> pd.Series:
    """urljoin each discovered href against its page URL (U1)."""

    def _resolve(parent, links):
        if links is None or parent is None:
            return []
        out = []
        for h in links:
            try:
                out.append(urltools.resolve_link(parent, h))
            except ValueError:
                continue
        return out

    return pd.Series([_resolve(p, l) for p, l in zip(parent_urls, hrefs)])


@pandas_udf(T.StringType())
def extract_email(urls: pd.Series) -> pd.Series:
    """mailto-and-misspellings address extraction (U3); null when invalid."""
    return urls.map(urltools.extract_email, na_action="ignore")


# --------------------------------------------------------------------------
# Extraction layer (html binary → …)
# --------------------------------------------------------------------------


@pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """THE byte-identical invariant (E1): html bytes → visible text."""
    return html.map(textextract.extract_text, na_action="ignore").fillna("")


@pandas_udf(T.StringType())
def decode_text(raw: pd.Series) -> pd.Series:
    """Charset-ladder decode for text payloads (X5; reference
    handle_response chardet path, playwrightcrawler.py:5091-5097). Feed a
    when()-guarded column so only text-route rows' bytes cross the Arrow
    boundary — python UDFs are not short-circuited by F.when."""
    return raw.map(
        lambda b: textextract.detect_decode(bytes(b)), na_action="ignore"
    )


@pandas_udf(T.ArrayType(T.StringType()))
def extract_links(html: pd.Series) -> pd.Series:
    """Raw hrefs/srcs from a/link/script/img (E4 harvest)."""
    return html.map(textextract.extract_links, na_action="ignore")


@pandas_udf(T.ArrayType(T.StringType()))
def top_words(texts: pd.Series) -> pd.Series:
    """Per-document top-24k token list (E5; Counter tiebreak parity)."""
    return texts.map(textextract.top_words, na_action="ignore")


@pandas_udf(T.ArrayType(T.StringType()))
def words_from_html(html: pd.Series) -> pd.Series:
    """E2+E5: word list straight from html bytes."""
    return html.map(textextract.words_from_html, na_action="ignore")


@pandas_udf(T.BooleanType())
def fast_scan_bails(html: pd.Series) -> pd.Series:
    """Diagnostic (round-5 verdict #4): whether each page bails out of the
    fast scanner into the HTMLParser walk. Not on any hot path — bench and
    tests aggregate it into a corpus bail rate."""
    return html.map(textextract.fast_scan_bailed, na_action="ignore").fillna(False)


_OPENDIR_SCHEMA = T.StructType([
    T.StructField("isopendir", T.BooleanType()),
    T.StructField("opendir_pattern", T.StringType()),
])


@pandas_udf(_OPENDIR_SCHEMA)
def open_dir(html: pd.Series, urls: pd.Series) -> pd.DataFrame:
    """Open-directory fingerprinting (E6) — returns which pattern matched."""
    rows = []
    for h, u in zip(html, urls):
        content = textextract.decode_html(h)
        rows.append(textextract.is_open_directory(content, u or ""))
    return pd.DataFrame(rows, columns=["isopendir", "opendir_pattern"])


# --------------------------------------------------------------------------
# Convenience wrappers used by the engine
# --------------------------------------------------------------------------


_EXTRACT_ALL_SCHEMA = T.StructType([
    T.StructField("text_extracted", T.StringType()),
    T.StructField("words", T.ArrayType(T.StringType())),
    T.StructField("raw_links", T.ArrayType(T.StringType())),
    T.StructField("isopendir", T.BooleanType()),
    T.StructField("opendir_pattern", T.StringType()),
])


def _extract_page_row(raw, url, route: str = "html"):
    """THE per-page extraction kernel, shared by ``extract_all`` and
    ``extract_all_routed`` so the invariant path and the wave hot path
    cannot drift (round-5 verdict #2 / advice: the two UDFs used to carry
    separate copies of this body).

    html (default) route — fused E1+E2/E5+E4+E6: ONE decode + ONE DOM walk
    produces text, word list, raw links and the open-dir verdict. Parser
    selection is shared with ``extract_text`` via ``textextract.parse_html``
    (bs4 when installed, fast-scan/stdlib walker here).

    plain_text route — charset-ladder decode (X5) + top_words, exactly the
    column pipeline it replaced: substring(decode,1,MAX) then top_words of
    the TRUNCATED text; null bytes → null text/words.
    """
    if route == "plain_text":
        if raw is None:
            return (None, None, [], False, "")
        text = textextract.detect_decode(bytes(raw))[: textextract.config.MAX_WEBCONTENT_SIZE]
        return (text, textextract.top_words(text), [], False, "")
    content = textextract.decode_html(raw)
    if not content:
        return ("", [], [], False, "")
    parts, links = textextract.parse_html(content)
    stripped = [t.strip() for t in parts]
    text = " ".join(t for t in stripped if t)[: textextract.config.MAX_WEBCONTENT_SIZE]
    words = textextract.top_words(" ".join(parts))
    od_flag, od_pat = textextract.is_open_directory(content, url or "")
    return (text, words, links, od_flag, od_pat)


@pandas_udf(_EXTRACT_ALL_SCHEMA)
def extract_all(html: pd.Series, urls: pd.Series) -> pd.DataFrame:
    """Fused single-parse extraction over html rows (no routing) — thin
    Arrow wrapper over ``_extract_page_row``; the crawl hot path uses the
    routed variant below, same kernel."""
    rows = [_extract_page_row(raw, url) for raw, url in zip(html, urls)]
    return pd.DataFrame(rows, columns=_EXTRACT_ALL_SCHEMA.fieldNames())


@pandas_udf(_EXTRACT_ALL_SCHEMA)
def extract_all_routed(html: pd.Series, urls: pd.Series, routes: pd.Series) -> pd.DataFrame:
    """Route-aware fused extraction: html rows take the DOM walk,
    plain_text rows the charset-ladder decode + top_words — so the ENTIRE
    wave needs exactly one Arrow crossing and the downstream crawled-commit
    stage is pure JVM (the two per-write-task python nodes the
    when()-guarded decode/top_words columns used to cost dominated the
    commit at fine scan-split counts). Per-page semantics live in
    ``_extract_page_row``."""
    rows = [
        _extract_page_row(raw, url, route)
        for raw, url, route in zip(html, urls, routes)
    ]
    return pd.DataFrame(rows, columns=_EXTRACT_ALL_SCHEMA.fieldNames())


def with_extraction(df, html_col: str = "html", url_col: str = "url",
                    route_col: str | None = None):
    """Append text/words/links/opendir columns via the fused single-parse
    UDF (one Arrow transfer of ``html``, one HTMLParser walk per page).
    With ``route_col`` the route-aware UDF also folds the plain-text
    decode into the same crossing. The struct is bound to a column first
    so the plan holds exactly one ArrowEvalPython node — field access
    never re-invokes the UDF."""
    if route_col is not None:
        ex = extract_all_routed(F.col(html_col), F.col(url_col), F.col(route_col))
    else:
        ex = extract_all(F.col(html_col), F.col(url_col))
    out = df.withColumn("_ex", ex)
    for field in _EXTRACT_ALL_SCHEMA.fieldNames():
        out = out.withColumn(field, F.col(f"_ex.{field}"))
    return out.drop("_ex")
