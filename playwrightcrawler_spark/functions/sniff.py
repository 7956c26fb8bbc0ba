"""Content-type inference for table-sourced pages.

The input table (BASELINE.json ``input_hint``) carries raw bytes but no
HTTP headers, so the engine infers ``content_type`` the way the reference's
fallback paths do when the browser yields none (httpx_fallback /
fast_extension_crawler HEAD validation, reference playwrightcrawler.py:
5060-5072, 4770-4902): magic bytes first, then the URL extension, then a
text/JSON/HTML sniff. Pure SQL — a when-chain over the binary prefix that
stays inside codegen; no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (hex-prefix, mime) — checked in order on the first bytes of the payload.
_MAGIC = [
    ("89504E47", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("47494638", "image/gif"),
    ("25504446", "application/pdf"),
    ("504B0304", "application/zip"),
    ("1F8B", "application/gzip"),
    ("494433", "audio/mpeg"),
    ("4D546864", "audio/midi"),
    ("774F4632", "font/woff2"),
    ("774F4646", "font/woff"),
    ("643A20", "application/x-bittorrent"),  # "d: " (loose bencode)
    ("64383A", "application/x-bittorrent"),  # "d8:"
    ("53514C69746520666F726D6174", "application/x-sql"),  # "SQLite format"
]

# extension → mime for payloads without distinctive magic
_EXT_MIME = {
    "html": "text/html", "htm": "text/html", "php": "application/x-php",
    "json": "application/json", "txt": "text/plain", "csv": "text/csv",
    "md": "text/markdown", "xml": "text/xml", "js": "text/javascript",
    "css": "text/css", "pdf": "application/pdf", "png": "image/png",
    "jpg": "image/jpeg", "jpeg": "image/jpeg", "gif": "image/gif",
    "webp": "image/webp", "svg": "image/svg+xml", "ico": "image/x-icon",
    "mp3": "audio/mpeg", "ogg": "audio/ogg", "wav": "audio/wav",
    "mid": "audio/midi", "midi": "audio/midi", "mp4": "video/mp4",
    "mkv": "video/x-matroska", "webm": "audio/webm", "mov": "video/quicktime",
    "zip": "application/zip", "gz": "application/gzip",
    "rar": "application/x-rar", "7z": "application/x-7z-compressed",
    "doc": "application/msword", "xls": "application/vnd.ms-excel",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "sql": "application/sql", "mdb": "application/x-msaccess",
    "sqlite": "application/x-sql",
    "torrent": "application/x-bittorrent", "cbz": "application/x-cbz",
    "cbr": "application/x-cbr", "woff": "font/woff", "woff2": "font/woff2",
    "ttf": "font/ttf", "otf": "font/otf", "eot": "font/eot",
}


def decode_utf8_replace(b: Column) -> Column:
    """binary → string with U+FFFD replacement (Python ``errors='replace'``
    analogue, reference get_words playwrightcrawler.py:2553-2558) that can
    never raise under ANSI mode: the binary→string cast wraps the bytes
    unvalidated and make_valid_utf8 substitutes invalid sequences."""
    return F.make_valid_utf8(b.cast("string"))


def sniff_content_type(html: Column, file_ext: Column) -> Column:
    """MIME type from magic bytes → extension → markup sniff → text/plain.
    NULL payloads (dead links) yield '' — the reference's empty-ctype
    convention for unreachable URLs (config REMOVE_EMPTY_CTYPE notes)."""
    head_hex = F.upper(F.hex(F.substring(html, 1, 16)))
    expr = F.when(html.isNull() | (F.length(html) == 0), "")
    for prefix, mime in _MAGIC:
        expr = expr.when(head_hex.startswith(prefix), mime)
    # video/mp4: '....ftyp' at byte offset 5
    expr = expr.when(F.upper(F.hex(F.substring(html, 5, 4))) == "66747970", "video/mp4")

    # one string constant → one codegen reference (a 60-entry create_map
    # would inline 120 literal refs and blow the generated method apart)
    pairs = ",".join(f"{k}:{v}" for k, v in _EXT_MIME.items())
    ext_map = F.expr(f"str_to_map('{pairs}', ',', ':')")
    by_ext = F.element_at(ext_map, F.lower(file_ext))
    # markup / JSON sniff on a short decoded prefix. NOT F.decode: under
    # Spark 4 ANSI mode a strict UTF-8 decode raises MALFORMED_CHARACTER_
    # CODING whenever the 256-byte cut splits a multibyte char (any valid
    # UTF-8 page!) or the payload isn't UTF-8. binary→string cast never
    # validates, and make_valid_utf8 replaces bad sequences with U+FFFD —
    # the reference's errors='replace' semantics, fully JVM-side.
    prefix_txt = F.ltrim(decode_utf8_replace(F.substring(html, 1, 256)))
    # STRONG html markers outrank the URL extension: a .png URL serving a
    # page that opens with <!DOCTYPE/<html IS html (the fast pass must
    # detect the mismatch and fall back to full extraction — reference
    # :4826-4860); weak signals ({, [, bare <) stay behind the extension.
    strong_html = (
        prefix_txt.startswith("<!DOCTYPE")
        | prefix_txt.startswith("<html")
        | prefix_txt.startswith("<HTML")
    )
    weak_sniffed = (
        F.when(prefix_txt.startswith("{") | prefix_txt.startswith("["), "application/json")
        .when(prefix_txt.startswith("<"), "text/html")
        .otherwise("text/plain")
    )
    return expr.otherwise(
        F.when(strong_html, "text/html").otherwise(F.coalesce(by_ext, weak_sniffed))
    )
