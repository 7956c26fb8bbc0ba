"""DuckDB oracle SQL for every SQL-expressible entry in queries.py.

Each statement is written against the pre-registered views (region nation
customer supplier part orders lineitem events documents embeddings) and
must produce the SAME column names, types and values as the Spark query.
Portability notes applied throughout:

- DuckDB regexp_replace needs the 'g' flag (Spark is global by default);
- len()/count() are BIGINT (Spark sizes cast to long to match);
- sum(BIGINT) is HUGEINT in DuckDB → CAST AS BIGINT;
- timestamps compared as epoch_us();
- md5() is the shared deterministic hash.
"""

from __future__ import annotations

# token split shared with operators.dedup.TOKEN_SPLIT
_TOKS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> length(t) >= 1)"
_TOKS4 = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> length(t) >= 4)"

_MINHASH_AGGS = ", ".join(
    f"min(md5('{s}:' || tok)) AS h{s}" for s in range(8)
)

_DOCS_WITH_COPIES = (
    "SELECT doc_id, text FROM documents "
    "UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents"
)

_SIG_SQL = f"""
    tok AS (
        SELECT DISTINCT doc_id, unnest({_TOKS}) AS tok FROM corpus
    ),
    sig AS (
        SELECT doc_id, {_MINHASH_AGGS} FROM tok GROUP BY doc_id
    ),
    band AS (
        SELECT doc_id, md5(h0 || '|' || h1 || '|' || h2 || '|' || h3) AS band_key FROM sig
        UNION ALL
        SELECT doc_id, md5(h4 || '|' || h5 || '|' || h6 || '|' || h7) AS band_key FROM sig
    ),
    pairs AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM band l JOIN band r USING (band_key)
        WHERE l.doc_id < r.doc_id
    )
"""

_STOP = {
    "en": "['the','and','of','to','in','is','that','for','with','this']",
    "fr": "['le','la','les','et','de','des','un','une','est','pour']",
    "de": "['der','die','das','und','ist','ein','eine','mit','für','nicht']",
    "es": "['el','la','los','las','y','de','un','una','es','para']",
}

_RATIOS = ", ".join(
    f"round(len(list_filter(toks, t -> list_contains({lst}, t)))::DOUBLE"
    f" / greatest(len(toks), 1), 6) AS ratio_{lang}"
    for lang, lst in _STOP.items()
)

_COSINE = (
    "round(list_dot_product(a.v, b.v)"
    " / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)"
)

# --------------------------------------------------------------------------
# Crawl-domain oracles run over the deterministic pages fixture parquet
# (written by queries._fixture_pages / ensured by __spark_entry__.oracle_sql)
# via DuckDB read_parquet — an independent SQL recomputation of the
# extension/magic-byte/route pipeline.
# --------------------------------------------------------------------------

import os as _os
import tempfile as _tempfile

from playwrightcrawler_spark.sources.pages_gen import fixture_path as _fixture_path

_FIXTURE_PARQUET = _fixture_path()

# path → lower-cased extension, replicating sqlfns.file_extension on the
# fixture's URL shapes (no %-escapes in fixture paths)
_SQL_PATH = r"regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)', 1)"
_SQL_EXT = rf"lower(regexp_extract({_SQL_PATH}, '[^/.]\.([^./]+)$', 1))"
_SQL_HOST = r"lower(regexp_extract(url, '://(?:[^/?#@]*@)?([^/?#:]+)', 1))"


def _case(expr: str, mapping: dict, default: str = "''") -> str:
    whens = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in mapping.items()
    )
    return f"(CASE {expr} {whens} ELSE {default} END)"


def _sniff_sql() -> str:
    """Magic-bytes → mime with extension fallback, mirroring sniff.py
    independently in SQL (hex prefixes on the BLOB)."""
    from playwrightcrawler_spark.functions import sniff as _sniff

    magic_whens = " ".join(
        f"WHEN hx LIKE '{prefix}%' THEN '{mime}'"
        for prefix, mime in _sniff._MAGIC
    )
    ext_mime = _case("ext", _sniff._EXT_MIME, default="NULL")
    # strong html markers outrank the extension (mirrors sniff.py order)
    return f"""(CASE
        WHEN hx IS NULL OR hx = '' THEN ''
        {magic_whens}
        WHEN substring(hx, 9, 8) = '66747970' THEN 'video/mp4'
        WHEN starts_with(ltrim(try_cast(unhex(substring(hx, 1, 504)) AS VARCHAR)), '<!DOCTYPE')
          OR starts_with(ltrim(try_cast(unhex(substring(hx, 1, 504)) AS VARCHAR)), '<html')
          OR starts_with(ltrim(try_cast(unhex(substring(hx, 1, 504)) AS VARCHAR)), '<HTML') THEN 'text/html'
        ELSE coalesce({ext_mime},
            CASE
              WHEN starts_with(ltrim(try_cast(unhex(substring(hx, 1, 504)) AS VARCHAR)), '{{')
                OR starts_with(ltrim(try_cast(unhex(substring(hx, 1, 504)) AS VARCHAR)), '[') THEN 'application/json'
              WHEN starts_with(ltrim(try_cast(unhex(substring(hx, 1, 504)) AS VARCHAR)), '<') THEN 'text/html'
              ELSE 'text/plain'
            END)
    END)"""


def _fast_ext_oracle() -> str:
    from playwrightcrawler_spark.functions import routing as _routing
    from playwrightcrawler_spark.functions import sniff as _sniff

    expected = _case("ext", _routing.EXTENSION_ROUTE)
    mimes = (
        {m for _, m in _sniff._MAGIC}
        | set(_sniff._EXT_MIME.values())
        | {"video/mp4", "text/html", "application/json", "text/plain"}
    )
    mime_route = _case("content_type", {m: _routing.route_for(m) for m in sorted(mimes)},
                       default="'unknown'")
    return f"""
        WITH p AS (
            SELECT url, hex(html) AS hx, {_SQL_EXT} AS ext
            FROM read_parquet('{_FIXTURE_PARQUET}')
        ),
        r AS (
            SELECT url, ext AS file_extension, {expected} AS expected_route,
                   {_sniff_sql()} AS content_type
            FROM p
        )
        SELECT url, file_extension, expected_route, content_type,
               {mime_route} AS actual_route,
               expected_route = {mime_route} AS consistent
        FROM r WHERE expected_route <> ''
        ORDER BY url
    """


def _simhash_oracle() -> str:
    """Full independent SQL recomputation of the 64-bit md5 SimHash: token
    md5-prefix hashes, per-bit ±1 votes over ALL occurrences, 16-bit-chunk
    banding, xor/bit_count hamming — no Spark kernel shared."""
    vote_cols = ", ".join(
        f"sum(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(64)
    )
    # literal power-of-two constants: DuckDB's << overflows at bit 63
    sim_terms = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {1 << b}::UBIGINT ELSE 0::UBIGINT END)"
        for b in range(64)
    )
    chunk_list = ", ".join(
        f"'c{i}:' || CAST((sim >> {16 * i}) & 65535 AS VARCHAR)" for i in range(4)
    )
    return f"""
        WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
        corpus AS (
            SELECT doc_id, text FROM base
            UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM base
        ),
        tok AS (
            SELECT doc_id, unnest({_TOKS}) AS tok FROM corpus
        ),
        h AS (
            SELECT doc_id, ('0x' || substring(md5(tok), 1, 16))::UBIGINT AS hv
            FROM tok
        ),
        votes AS (SELECT doc_id, {vote_cols} FROM h GROUP BY doc_id),
        sig AS (SELECT doc_id, {sim_terms} AS sim FROM votes),
        chunks AS (
            SELECT doc_id, sim, unnest([{chunk_list}]) AS chunk FROM sig
        ),
        pairs AS (
            SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
                   CAST(bit_count(xor(l.sim, r.sim)) AS BIGINT) AS hamming
            FROM chunks l JOIN chunks r USING (chunk)
            WHERE l.doc_id < r.doc_id
        )
        SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
        ORDER BY id_a, id_b
    """


def _lsh_topk_oracle(bits: int = 8, seed: int = 42, dim: int = 64,
                     multiprobe: int = 2, k: int = 20) -> str:
    """Independent SQL recomputation of the hyperplane-LSH ANN path: the
    seeded plane matrix is emitted as literal DOUBLE lists, DuckDB derives
    every vector's sign-bit bucket, the probe set (hamming <= multiprobe
    from the query's bucket) and the exact cosine top-k inside it."""
    from playwrightcrawler_spark.operators.similarity import _planes

    planes = _planes(dim, bits, seed)
    lits = [
        "[" + ", ".join(repr(float(x)) for x in planes[b]) + "]"
        for b in range(bits)
    ]
    sig = " + ".join(
        f"(CASE WHEN list_dot_product(v, {lits[b]}) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(bits)
    )
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        s AS (SELECT vec_id, v, {sig} AS bucket FROM e),
        q AS (SELECT v AS qv, bucket AS qb FROM s WHERE vec_id = 0),
        probed AS (
            SELECT s.vec_id, s.v, q.qv FROM s, q
            WHERE bit_count(xor(s.bucket::BIGINT, q.qb::BIGINT)) <= {multiprobe}
        ),
        c AS (
            SELECT vec_id,
                   round(list_dot_product(v, qv)
                     / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cosine
            FROM probed
        )
        SELECT vec_id, cosine FROM c ORDER BY cosine DESC, vec_id LIMIT {k}
    """


def _expected_crawl_boot() -> list[tuple[str, str]]:
    """Pure-Python replication of the bootstrap hygiene over the
    deterministic fixture rows (generate_rows is seeded — no Spark and no
    parquet read involved): returns the (canonical_url, host) frontier the
    engine must build. Uses the reference-parity scalar functions
    (sanitize_url / has_repeated_segments — themselves pinned against the
    reference by pytest), NOT the Spark column pipeline under test."""
    import re as _re
    from urllib.parse import urlsplit as _urlsplit

    from playwrightcrawler_spark import config as _config
    from playwrightcrawler_spark.functions import urltools as _ut
    from playwrightcrawler_spark.sources import pages_gen as _pg

    host_block = [_re.compile(p) for p in _config.HOST_REGEX_BLOCK_LIST]
    host_allow = [_re.compile(p) for p in _config.HOST_REGEX_ALLOW_LIST]
    url_block = [_re.compile(p) for p in _config.URL_REGEX_BLOCK_LIST]
    seen, out = set(), []
    for row in _pg.generate_rows():
        u = row["url"]
        # raw-url checks precede canonicalization (reference order)
        if _ut.is_embedded_url(u) or len(u) > _config.MAX_URL_LENGTH:
            continue
        cu = _ut.sanitize_url(u)
        if not cu:
            continue
        try:
            host = _urlsplit(cu).hostname
        except ValueError:
            host = None
        if not host:
            continue
        host = host.lower()
        if any(rx.search(host) for rx in host_block):
            continue
        if not any(rx.search(host) for rx in host_allow):
            continue
        if any(rx.search(cu) for rx in url_block):
            continue
        if _ut.has_repeated_segments(cu):
            continue
        if cu in seen:
            continue
        seen.add(cu)
        out.append((cu, host))
    return out


def _crawl_wave_oracle(quota: int = 3, wave_size: int = 200) -> str:
    """Independent SQL recomputation of one crawl wave under the
    SQL-replicable configuration of queries.q_crawl_wave: python-hygiene
    bootstrap VALUES → per-host url-ordered quota window → global
    url-ordered limit (the 'oldest' policy over equal bootstrap
    timestamps) → fetch hit/miss via LEFT JOIN on the fixture parquet →
    magic-byte sniff + route tables recomputed in SQL."""
    from playwrightcrawler_spark.functions import routing as _routing
    from playwrightcrawler_spark.functions import sniff as _sniff

    boot = _expected_crawl_boot()
    values = ",\n            ".join(
        "('" + u.replace("'", "''") + "')" for u, _ in boot
    )
    mimes = (
        {m for _, m in _sniff._MAGIC}
        | set(_sniff._EXT_MIME.values())
        | {"video/mp4", "text/html", "application/json", "text/plain"}
    )
    mime_route = _case(
        "content_type",
        {m: _routing.route_for(m) for m in sorted(mimes)},
        default=f"'{_routing.route_for('')}'",
    )
    return f"""
        WITH boot(url) AS (VALUES {values}),
        b AS (SELECT url, {_SQL_HOST} AS host FROM boot),
        ranked AS (
            SELECT url, host,
                   row_number() OVER (PARTITION BY host ORDER BY url) AS rn
            FROM b
        ),
        sel AS (
            SELECT url, host FROM ranked WHERE rn <= {quota}
            ORDER BY url LIMIT {wave_size}
        ),
        j AS (
            SELECT s.url, s.host, p.url IS NOT NULL AS hit,
                   hex(p.html) AS hx, {_SQL_EXT.replace('url', 's.url')} AS ext
            FROM sel s LEFT JOIN read_parquet('{_FIXTURE_PARQUET}') p
              ON s.url = p.url
        ),
        r AS (
            SELECT url, host, hit, ext AS file_extension,
                   CASE WHEN hit THEN {_sniff_sql()} ELSE '' END AS content_type
            FROM j
        )
        SELECT url,
               CASE WHEN NOT hit THEN 'missing' ELSE {mime_route} END AS route,
               content_type, host, file_extension, 1 AS wave
        FROM r
    """


ORACLES: dict[str, str] = {
    # ----------------------------------------------------------- relational
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "top_customers": """
        SELECT c_custkey, c_name, c_mktsegment,
               round(sum(o_totalprice), 2) AS revenue,
               count(*) AS order_count
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name, c_mktsegment
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    # ------------------------------------------------------------- frontier
    "frontier_oldest_per_host": """
        WITH r AS (
            SELECT user_id, event_id, ts,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events
        )
        SELECT user_id, event_id, epoch_us(ts) AS ts_us
        FROM r WHERE rn = 1
        ORDER BY ts_us, event_id
        LIMIT 100
    """,
    "frontier_fewest_urls": """
        WITH c AS (SELECT user_id, count(*) AS n_urls FROM events GROUP BY user_id),
             f AS (
                SELECT user_id, event_id,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
                FROM events
             )
        SELECT f.user_id, f.event_id, c.n_urls
        FROM f JOIN c USING (user_id)
        WHERE rn = 1
        ORDER BY n_urls, user_id
        LIMIT 50
    """,
    "frontier_random_pivot": """
        WITH b AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events),
             flt AS (
                SELECT user_id, event_id FROM events, b
                WHERE epoch_us(ts) >= lo + CAST(floor(0.5 * (hi - lo)) AS BIGINT)
             ),
             r AS (
                SELECT user_id, event_id,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
                       ) AS rn
                FROM flt
             )
        SELECT user_id, event_id FROM r WHERE rn = 1
        ORDER BY md5(CAST(event_id AS VARCHAR))
        LIMIT 100
    """,
    "seen_anti_join": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ORDER BY c_custkey
    """,
    # the Bloom path must be indistinguishable from the plain anti-join
    "seen_bloom_prefilter": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ORDER BY c_custkey
    """,
    "minmax_timestamp": """
        SELECT epoch_us(min(ts)) AS min_ts_us,
               epoch_us(max(ts)) AS max_ts_us,
               count(*) AS n_docs
        FROM events
    """,
    "latest_per_host": """
        WITH r AS (
            SELECT user_id, event_id,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        SELECT user_id, event_id, rn FROM r WHERE rn <= 3
    """,
    # -------------------------------------------------------- distributions
    "events_windowed": """
        SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
               time_bucket(INTERVAL '6 hours', ts) + INTERVAL '6 hours' AS window_end,
               event_type,
               count(*) AS events,
               round(sum(value), 6) AS total_value
        FROM events
        GROUP BY 1, 2, 3
        ORDER BY 1, 3
    """,
    "asof_join": """
        WITH clicks AS (
            SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
        ),
        signups AS (
            SELECT user_id, ts, value FROM events WHERE event_type = 'signup'
        )
        SELECT c.user_id, c.event_id, epoch_us(c.ts) AS ts_us,
               coalesce(epoch_us(s.ts), -1) AS signup_ts_us,
               coalesce(round(s.value, 6), -1.0) AS signup_value
        FROM clicks c ASOF LEFT JOIN signups s
          ON c.user_id = s.user_id AND c.ts >= s.ts
        ORDER BY c.user_id, ts_us
    """,
    "sessionize": """
        WITH e AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             > INTERVAL '6 hours'
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        THEN 1 ELSE 0 END AS new_s
            FROM events
        ),
        s AS (
            SELECT user_id, ts, value,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM e
        )
        SELECT user_id,
               epoch_us(min(ts)) AS start_us,
               epoch_us(max(ts) + INTERVAL '6 hours') AS end_us,
               count(*) AS n_events,
               round(sum(value), 6) AS total_value
        FROM s GROUP BY user_id, sid
        ORDER BY user_id, start_us
    """,
    "distribution_by_type": """
        SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
        FROM events GROUP BY event_type
    """,
    "docs_by_lang": """
        SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
        FROM documents GROUP BY lang
    """,
    "cleanup_rules": """
        SELECT coalesce(
                 CASE WHEN n_chars < 150 THEN 'too_short'
                      WHEN lang NOT IN ('en','fr','de','es','zh') THEN 'bad_lang'
                      WHEN regexp_matches(text, '(?i)lorem ipsum') THEN 'boilerplate'
                 END, 'kept') AS drop_reason,
               count(*) AS n
        FROM documents
        GROUP BY 1
    """,
    "topk_words": f"""
        WITH toks AS (SELECT unnest({_TOKS4}) AS word FROM documents)
        SELECT word, count(*) AS cnt FROM toks
        GROUP BY word ORDER BY cnt DESC, word LIMIT 100
    """,
    # ---------------------------------------------------------------- dedup
    "exact_dedup": f"""
        WITH corpus AS ({_DOCS_WITH_COPIES}),
             fp AS (
                SELECT doc_id,
                       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
                FROM corpus
             ),
             r AS (
                SELECT doc_id, fingerprint,
                       row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
                FROM fp
             )
        SELECT doc_id, fingerprint FROM r WHERE rn = 1 ORDER BY doc_id
    """,
    "minhash_signatures": f"""
        WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
             tok AS (SELECT DISTINCT doc_id, unnest({_TOKS}) AS tok FROM corpus)
        SELECT doc_id, {_MINHASH_AGGS} FROM tok GROUP BY doc_id ORDER BY doc_id
    """,
    "minhash_lsh_pairs": f"""
        WITH corpus AS ({_DOCS_WITH_COPIES}),
        {_SIG_SQL}
        SELECT id_a, id_b FROM pairs ORDER BY id_a, id_b
    """,
    # guaranteed-recall invariant of the xxh64 production path: identical
    # texts share every min-hash in any hash mode, so every doc with a
    # non-empty token set pairs with its exact copy — the oracle derives
    # the expected count independently and pins found==expected, missed==0
    "minhash_lsh_pairs_xxh": f"""
        SELECT CAST(count(*) AS BIGINT) AS expected_copy_pairs,
               CAST(count(*) AS BIGINT) AS found_copy_pairs,
               CAST(0 AS BIGINT) AS pairs_missed
        FROM documents WHERE len({_TOKS}) > 0
    """,
    "embedding_lsh_topk": _lsh_topk_oracle(),
    # persisted-bucket variant probes the same signatures with the same
    # probe set — the answer is identical by construction, so it shares
    # the recompute-everything oracle
    "embedding_lsh_topk_bucketed": _lsh_topk_oracle(),
    "winnowing": f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents WHERE doc_id < 100
        ),
        g0 AS (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(toks) - 2),
                       i -> struct_pack(pos := i,
                            gram := array_to_string(list_slice(toks, i, i + 2), ' ')))) AS u
            FROM toks WHERE len(toks) >= 3
        ),
        g AS (
            SELECT doc_id, u.pos AS pos,
                   substring(md5(u.gram), 1, 16) AS h
            FROM g0
        ),
        keyed AS (
            SELECT doc_id, pos,
                   h || '#' || lpad(CAST(999999999 - pos AS VARCHAR), 9, '0') AS key,
                   count(*) OVER (PARTITION BY doc_id) AS ng
            FROM g
        ),
        selw AS (
            SELECT doc_id, pos, ng,
                   min(key) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
            FROM keyed
        ),
        s AS (SELECT DISTINCT doc_id, sel FROM selw WHERE pos <= greatest(ng - 3, 1))
        SELECT doc_id,
               CAST(999999999 - CAST(split_part(sel, '#', 2) AS INT) AS INT) AS pos,
               split_part(sel, '#', 1) AS fp
        FROM s ORDER BY doc_id, pos
    """,
    "winnowing_pairs": f"""
        WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
        corpus AS (
            SELECT doc_id, text FROM base
            UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM base
        ),
        toks AS (SELECT doc_id, {_TOKS} AS toks FROM corpus),
        g0 AS (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(toks) - 2),
                       i -> struct_pack(pos := i,
                            gram := array_to_string(list_slice(toks, i, i + 2), ' ')))) AS u
            FROM toks WHERE len(toks) >= 3
        ),
        g AS (
            SELECT doc_id, u.pos AS pos, substring(md5(u.gram), 1, 16) AS h FROM g0
        ),
        keyed AS (
            SELECT doc_id, pos,
                   h || '#' || lpad(CAST(999999999 - pos AS VARCHAR), 9, '0') AS key,
                   count(*) OVER (PARTITION BY doc_id) AS ng
            FROM g
        ),
        selw AS (
            SELECT doc_id, pos, ng,
                   min(key) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
            FROM keyed
        ),
        fps AS (
            SELECT DISTINCT doc_id, split_part(sel, '#', 1) AS fp
            FROM selw WHERE pos <= greatest(ng - 3, 1)
        ),
        rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 20),
        fr AS (SELECT doc_id, fp FROM fps JOIN rare USING (fp))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fps
        FROM fr a JOIN fr b USING (fp)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= 2
        ORDER BY id_a, id_b
    """,
    "decontaminate": f"""
        WITH sh AS (
            SELECT doc_id,
                   CASE WHEN len({_TOKS}) >= 5 THEN
                       list_distinct(list_transform(
                           generate_series(1, len({_TOKS}) - 4),
                           i -> array_to_string(list_slice({_TOKS}, i, i + 4), ' ')
                       ))
                   ELSE [] END AS sh
            FROM documents
        ),
        bench AS (SELECT DISTINCT unnest(sh) AS gram FROM sh WHERE doc_id % 23 = 0),
        cand AS (SELECT doc_id, unnest(sh) AS gram FROM sh WHERE doc_id % 23 != 0),
        hits AS (
            SELECT doc_id, count(*) AS n_overlap
            FROM cand JOIN bench USING (gram) GROUP BY 1
        )
        SELECT s.doc_id,
               len(s.sh) AS n_ngrams,
               coalesce(h.n_overlap, 0) AS n_overlap,
               coalesce(h.n_overlap, 0) >= 1 AS contaminated
        FROM sh s LEFT JOIN hits h USING (doc_id)
        WHERE s.doc_id % 23 != 0
        ORDER BY s.doc_id
    """,
    "ngram_jaccard": f"""
        WITH corpus AS ({_DOCS_WITH_COPIES}),
        {_SIG_SQL},
        sh AS (
            SELECT doc_id,
                   CASE WHEN len({_TOKS}) >= 3 THEN
                       list_distinct(list_transform(
                           generate_series(1, len({_TOKS}) - 2),
                           i -> array_to_string(list_slice({_TOKS}, i, i + 2), ' ')
                       ))
                   ELSE [] END AS sh
            FROM corpus
        ),
        j AS (
            SELECT p.id_a, p.id_b,
                   len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS inter,
                   len(a.sh) + len(b.sh)
                     - len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS uni
            FROM pairs p
            JOIN sh a ON a.doc_id = p.id_a
            JOIN sh b ON b.doc_id = p.id_b
        )
        SELECT id_a, id_b,
               round(CASE WHEN uni > 0 THEN inter::DOUBLE / uni ELSE 0.0 END, 6) AS jaccard
        FROM j
        WHERE (CASE WHEN uni > 0 THEN inter::DOUBLE / uni ELSE 0.0 END) >= 0.8
        ORDER BY id_a, id_b
    """,
    # ----------------------------------------------------------- similarity
    "embedding_topk": """
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
             s AS (
                SELECT vec_id,
                       list_dot_product(CAST(embedding AS DOUBLE[]), qv)
                         / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                            * sqrt(list_dot_product(qv, qv))) AS c
                FROM embeddings, q
             )
        SELECT vec_id, round(c, 6) AS cosine
        FROM s ORDER BY cosine DESC, vec_id LIMIT 20
    """,
    # brute-force all-pairs ground truth: the Spark side answers with the
    # LSH-banded plan — identical rows prove the bucketed path is lossless
    "embedding_near_dup": f"""
        WITH e0 AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE vec_id < 150
        ),
        e AS (
            SELECT * FROM e0
            UNION ALL SELECT vec_id + 1000000 AS vec_id, v FROM e0
        ),
        p AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COSINE} AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
        )
        SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.95
        ORDER BY id_a, id_b
    """,
    # ------------------------------------------------------- text analytics
    "lang_id": f"""
        WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
             r AS (
                SELECT doc_id, {_RATIOS},
                       round(length(regexp_replace(text, '[^一-鿿]', '', 'g'))::DOUBLE
                             / greatest(length(text), 1), 6) AS ratio_cjk
                FROM t
             )
        SELECT doc_id, ratio_en, ratio_fr, ratio_de, ratio_es, ratio_cjk,
               CASE WHEN ratio_cjk > 0.05 THEN 'zh'
                    WHEN ratio_en = greatest(ratio_en, ratio_fr, ratio_de, ratio_es)
                         AND greatest(ratio_en, ratio_fr, ratio_de, ratio_es) > 0 THEN 'en'
                    WHEN ratio_fr = greatest(ratio_en, ratio_fr, ratio_de, ratio_es)
                         AND greatest(ratio_en, ratio_fr, ratio_de, ratio_es) > 0 THEN 'fr'
                    WHEN ratio_de = greatest(ratio_en, ratio_fr, ratio_de, ratio_es)
                         AND greatest(ratio_en, ratio_fr, ratio_de, ratio_es) > 0 THEN 'de'
                    WHEN ratio_es = greatest(ratio_en, ratio_fr, ratio_de, ratio_es)
                         AND greatest(ratio_en, ratio_fr, ratio_de, ratio_es) > 0 THEN 'es'
                    ELSE 'unknown'
               END AS pred_lang
        FROM r ORDER BY doc_id
    """,
    "quality_scores": f"""
        WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
             f AS (
                SELECT doc_id,
                       length(text) AS n_chars,
                       len(toks) AS n_tokens,
                       CASE WHEN len(toks) > 0
                            THEN list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks)
                            ELSE 0.0 END AS mwl,
                       length(regexp_replace(text, '[^.!?,;:]', '', 'g'))::DOUBLE
                         / greatest(length(text), 1) AS pr,
                       len(list_filter(toks, x -> list_contains({_STOP['en']}, x)))::DOUBLE
                         / greatest(len(toks), 1) AS sr
                FROM t
             )
        SELECT doc_id, n_chars, n_tokens,
               round(mwl, 6) AS mean_word_len,
               round(pr, 6) AS punct_ratio,
               round(sr, 6) AS stopword_ratio,
               (n_chars >= 100 AND n_tokens >= 20
                AND mwl >= 2.0 AND mwl <= 12.0 AND pr <= 0.2) AS keep
        FROM f ORDER BY doc_id
    """,
    "stratified_sample": """
        SELECT doc_id, lang
        FROM documents
        WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              / 4294967296.0
              < (CASE lang WHEN 'en' THEN 0.6 WHEN 'fr' THEN 0.3 ELSE 0.1 END)
        ORDER BY doc_id
    """,
    "unigram_logprob": f"""
        WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
             freq AS (SELECT tok, count(*) AS tok_n FROM tok GROUP BY 1),
             lp AS (
                SELECT tok, ln(tok_n::DOUBLE / sum(tok_n) OVER ()) AS logp
                FROM freq
             )
        SELECT doc_id,
               count(*) AS n_tokens,
               round(avg(logp), 6) AS mean_logprob,
               round(exp(-avg(logp)), 6) AS ppl
        FROM tok JOIN lp USING (tok)
        GROUP BY 1 ORDER BY 1
    """,
    "repetition_stats": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
             base AS (
                SELECT doc_id, len(toks) AS n_tokens,
                       len(list_distinct(toks)) AS n_distinct
                FROM toks
             ),
             bg AS (
                SELECT doc_id,
                       unnest(list_transform(range(len(toks) - 1),
                              i -> toks[i + 1] || ' ' || toks[i + 2])) AS bigram
                FROM toks WHERE len(toks) >= 2
             ),
             bgc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
             bgs AS (SELECT doc_id, max(c) AS top_c, sum(c) AS tot FROM bgc GROUP BY 1),
             pos AS (
                SELECT doc_id,
                       unnest(list_transform(range(len(toks)),
                              i -> struct_pack(pos := i, tok := toks[i + 1]))) AS u
                FROM toks
             ),
             flagged AS (
                SELECT doc_id, u.pos AS pos, u.tok AS tok,
                       CASE WHEN lag(u.tok) OVER (PARTITION BY doc_id ORDER BY u.pos)
                                 IS DISTINCT FROM u.tok THEN 1 ELSE 0 END AS chg
                FROM pos
             ),
             isl AS (
                SELECT doc_id, tok,
                       sum(chg) OVER (PARTITION BY doc_id ORDER BY pos
                                      ROWS UNBOUNDED PRECEDING) AS island
                FROM flagged
             ),
             runs AS (
                SELECT doc_id, max(c) AS max_run
                FROM (SELECT doc_id, island, count(*) AS c FROM isl GROUP BY 1, 2)
                GROUP BY 1
             ),
             f AS (
                SELECT b.doc_id,
                       b.n_tokens,
                       round(b.n_distinct::DOUBLE / greatest(b.n_tokens, 1), 6) AS ttr,
                       round(coalesce(s.top_c::DOUBLE / s.tot, 0.0), 6) AS top_bigram_frac,
                       coalesce(r.max_run, 0) AS max_token_run
                FROM base b
                LEFT JOIN bgs s USING (doc_id)
                LEFT JOIN runs r USING (doc_id)
             )
        SELECT doc_id, n_tokens, ttr, top_bigram_frac, max_token_run,
               ((n_tokens >= 20 AND top_bigram_frac >= 0.08)
                OR max_token_run > 3 OR ttr <= 0.35) AS repetitive
        FROM f ORDER BY doc_id
    """,
    "token_counts": """
        SELECT lang,
               count(*) AS docs,
               CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS ws_tokens,
               CAST(sum(CAST(ceil(length(text)::DOUBLE / 4.0) AS BIGINT)) AS BIGINT) AS bpe_tokens_est
        FROM documents GROUP BY lang ORDER BY lang
    """,
    "fingerprints": """
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
        FROM documents WHERE doc_id < 100 ORDER BY doc_id
    """,
    # ------------------------------------------------------- crawl domain
    "downloader_scan": f"""
        WITH c AS (
            SELECT url, {_SQL_HOST} AS host, {_SQL_EXT} AS file_extension
            FROM read_parquet('{_FIXTURE_PARQUET}')
        )
        SELECT url, host, file_extension FROM c
        WHERE regexp_matches(file_extension, '^(png|jpe?g|gif|pdf|zip|mp3|mp4)$')
          AND NOT regexp_matches(host, '^media\\.')
        ORDER BY url
    """,
    "fast_extension_pass": _fast_ext_oracle(),
    # X9/X10: independent SQL recomputation of the budgeted-fetch pipeline —
    # rank per host in url order, rank<=2 attempts fetch (missing when the
    # url is not in pages), over-budget rows skipped with no payload
    "downloader_fetch": f"""
        WITH c AS (
            SELECT url, {_SQL_HOST} AS host, {_SQL_EXT} AS file_extension
            FROM read_parquet('{_FIXTURE_PARQUET}')
        ),
        scan AS (
            SELECT url, host FROM c
            WHERE regexp_matches(file_extension, '^(png|jpe?g|gif|pdf|zip|mp3|mp4)$')
              AND NOT regexp_matches(host, '^media\\.')
        ),
        want AS (
            SELECT url, host FROM scan
            UNION ALL
            SELECT 'https://cdn.example.com/assets/0missing.png', 'cdn.example.com'
        ),
        r AS (
            SELECT url, host,
                   row_number() OVER (PARTITION BY host ORDER BY url) AS rn
            FROM want
        ),
        j AS (
            SELECT r.url, r.host, r.rn, p.html
            FROM r LEFT JOIN read_parquet('{_FIXTURE_PARQUET}') p USING (url)
        )
        SELECT url, host,
               coalesce(CASE WHEN rn <= 2 AND html IS NOT NULL
                             THEN CAST(octet_length(html) AS BIGINT) END,
                        CAST(-1 AS BIGINT)) AS bytes_len,
               CASE WHEN rn > 2 THEN 'skipped_budget'
                    WHEN html IS NULL THEN 'missing'
                    ELSE 'downloaded' END AS status
        FROM j
    """,
    "simhash_candidates": _simhash_oracle(),
    "crawl_wave": _crawl_wave_oracle(),
    # identical recompute: the bucketed-layout wave must change NOTHING
    # about the result — DuckDB recomputes from the flat fixture, the
    # engine runs on the hive-partitioned copy with partition pruning live
    "crawl_wave_bucketed": _crawl_wave_oracle(),
    # multimodal plumbing with the deterministic fake decoder: width/height
    # derive from the first two payload bytes, recomputed here from the
    # hex dump; sha256/sha512-filename columns are excluded (DuckDB hashes
    # VARCHAR only) and are pinned by pytest instead
    "media_metadata": f"""
        WITH m AS (
            SELECT url, html, hex(html) AS hx
            FROM read_parquet('{_FIXTURE_PARQUET}')
            WHERE regexp_matches(url, '\\.(png|jpg|gif|mp4|mp3)$')
        )
        SELECT url,
               'image' AS media_type,
               CAST(octet_length(html) AS BIGINT) AS n_bytes,
               CAST(16 + ('0x' || substring(hx, 1, 2))::INT % 64 AS INT) AS width,
               CAST(16 + ('0x' || substring(hx, 3, 2))::INT % 64 AS INT) AS height,
               CAST((16 + ('0x' || substring(hx, 1, 2))::INT % 64)
                    * (16 + ('0x' || substring(hx, 3, 2))::INT % 64) AS BIGINT) AS resolution,
               'RGB' AS mode,
               CAST(NULL AS DOUBLE) AS isnsfw,
               TRUE AS decode_ok,
               CAST(NULL AS VARCHAR) AS decode_error
        FROM m ORDER BY url
    """,
    # E1 invariant reduced to one row: n_pages counted independently from
    # the fixture; mismatches pinned to 0 = the byte-identical contract
    "pages_extract": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_pages,
               CAST(0 AS BIGINT) AS mismatches
        FROM read_parquet('{_FIXTURE_PARQUET}')
        WHERE text <> ''
    """,
}
