"""Content-type routing — the reference's dispatch table as a Catalyst
``CASE WHEN`` chain.

The reference registers 14 async handlers behind regex groups and dispatches
each response to the FIRST registered group whose regex matches the
sanitized content type (function_for_content_type,
reference playwrightcrawler.py:2420-2455; dispatch :5112-5131). Handler
registration order — which is the precedence order — is:

    ignore → plain_text → font → video → audio → pdf → doc → database →
    torrent → comic → compressed → midi → html → image

(decorators at reference playwrightcrawler.py:2640/2687/2845/2894/2942/
2988/3035/3084/3135/3185/3237/3288/3372/3771). Three consequences we keep
bit-faithful because they are observable:

* ``application/ogg`` appears in both audio and video groups → routes to
  **video** (registered earlier);
* ``application/x-cbr``/``x-cbz`` appear in doc and comic → route to **doc**;
* when USE_OCTET_STREAM is on, the octet-stream aliases are appended to all
  11 binary groups (reference :940-958) → they dispatch to **font**, the
  first binary group in registration order.

Alias tables are this engine's own compact form of the same families: the
exact aliases that decide precedence plus anchored family patterns for the
long tail (the reference enumerates ~700 vanity aliases; a family pattern
like ``^application/[\\w.\\-]++json$`` covers them without the list).

Everything here is pure Spark SQL — no UDFs; the when-chain runs inside
whole-stage codegen.
"""

from __future__ import annotations

import re
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

from playwrightcrawler_spark import config

# --------------------------------------------------------------------------
# Alias groups (anchored, case-insensitive at compile time)
# --------------------------------------------------------------------------

OCTETSTREAM_ALIASES = [
    r"^text/octet$", r"^octet/stream$", r"^application/stream$",
    r"^binary/octet-stream$", r"^application/download$",
    r"^application/x-download$", r"^application/octetstream$",
    r"^application/octet-stream$", r"^application/x-octet-stream$",
    r"^x-application/octet-stream$", r"^application/force-download$",
    r"^application/x-www-form-urlencoded$",
    r"^application/octet-stream,text/html$",
    r"^application/octet-streamtext/plain$",
    r"^application/octet-stream,text/plain$",
    r"^application/octet-stream,atext/plain$",
    r"^application/octet-streamCharset=UTF-8$",
    r"^application/vnd\.google\.octet-stream-compressible$",
]

_IGNORE = [
    # empty / placeholder / junk types the reference records but never parses
    r"^$", r"^-$", r"^\*$", r"^\*/\*$", r"^None$", r"^null$", r"^\(null\)$",
    r"^\(none\)$", r"^binary$", r"^unknown$", r"^file$", r"^js$",
    r"^javascript$", r"^application$", r"^Content-Type$", r"^redirect$",
    r"^cms/redirect$", r"^test/plain$", r"^unknown/unknown$",
    r"^inode/x-empty$", r"^httpd/unix-directory$",
    # css / javascript families (recorded, not crawled)
    r"^text/css(,text/css)?$", r"^text/x-scss$", r"^text/javascript.*",
    r"^text/x-javascript$", r"^application/(x-)?javascript.*",
    r"^applications/javascript$", r"^javascript.?charset=UTF-8$",
    r"^application/js$", r"^application/x-js$", r"^application/jsv$",
    r"^application/ecmascript$", r"^application/typescript$",
    r"^text/html,application/javascript$", r"^text/htmltext/css$",
    r"^text/html,text/css$",
    # xml feed/config family
    r"^application/(?!xhtml)[\w.\-]*xml$",
    r"^application/(?!xhtml)[\w.\-]+\+xml$",
    r"^application/xml-dtd$",
    # executables / packages / certificates / misc binaries
    r"^application/exe$", r"^application/x-msdownload$",
    r"^application/x-(ms-)?dos-?(executable|program)$",
    r"^application/x-executable$", r"^application/x-dosexec$",
    r"^application/x-msi$", r"^application/java-vm$",
    r"^application/(x-)?java-archive$", r"^application/x-debian-package$",
    r"^application/x-redhat-package-manager$", r"^application/x-rpm$",
    r"^application/x-iso9660-image$", r"^application/x-apple-diskimage$",
    r"^application/vnd\.android\.package-archive$",
    r"^application/x-chrome-extension$", r"^application/x-xpinstall$",
    r"^application/pkix-(cert|crl)$", r"^application/x-x509-ca-cert$",
    r"^application/pgp-(keys|encrypted|signature)$",
    r"^application/pkcs7-mime$", r"^application/x-pkcs7-certificates$",
    # documents the reference chose NOT to route to doc
    r"^application/postscript$", r"^application/rtf$", r"^application/csv$",
    r"^application/epub(\+zip)?$", r"^application/mobi$",
    r"^application/x-mobi(pocket|8)-ebook$",
    r"^application/vnd\.ms-powerpoint$", r"^application/vnd\.apple\.keynote$",
    r"^application/vnd\.openxmlformats$", r"^application/acad$",
    # data / misc application types
    r"^application/wasm$", r"^application/zlib$", r"^application/msgpack$",
    r"^application/(x-)?protobuf$", r"^application/grpc-web.*",
    r"^application/jwt$", r"^application/dns-message$",
    r"^application/csp-report$", r"^application/x-csp-hyperevent$",
    r"^application/link-format$", r"^application/n-triples$",
    r"^application/turtle$", r"^application/node$", r"^application/express$",
    r"^application/x-sh$", r"^application/x-httpd-.*", r"^application/cgi$",
    r"^application/x-(po|twb|xcf|xar|plt|shar|ruby|frpc|tgif|perl|doom|"
    r"troff|troff-man|trash|empty|blorb|netcdf|nozomi|adrift|binary|subrip|"
    r"bibtex|stuffit|zmachine|director|asciicast|base64-frpc|directory|"
    r"endnote-refer|research-info-systems|typekit-augmentation|"
    r"unknown-content-type|ms-manifest|ms-application|java-jnlp-file|"
    r"shared-scripts|mobipocket-ebook)$",
    r"^application/(plain|save|null|empty|unknown|binary|aux|smil|mbox|"
    r"oct-stream|proto|calques3d|privatetempstorage|encrypted-v2|"
    r"mac-binhex40|mac-compactpro)$",
    r"^application/vnd\.(smaf|yt-ump|ms-wpl|visionary|olpc-sugar|"
    r"ms-htmlhelp|ms-opentype|lotus-screencam|geogebra\.file|"
    r"google-earth\.km[lz].*|groove-tool-template|mapbox-vector-tile|"
    r"wv\.csp\+wbxml|apple\.mpegurl|apple\.installer\+xml|"
    r"cas\.services\+yaml|ogc\.wms_xml)$",
    r"^application/apple\.vnd\.mpegurl$",
    r"^application/vnd\.(sas\.api|adobe\.skybox|oracle\.adf\.resourceitem)"
    r"\+json$",
    # model / chemical / message families
    r"^model/.*", r"^chemical/.*", r"^message/.*", r"^multipart/.*",
    # stray text types recorded as-is
    r"^text/x-(matlab|invalid|haskell|unknown-content-type)$",
    r"^text/plaincharset:.*", r"^text/remix-deferred$",
    r"^text/javascript=UTF-8$",
]

_PLAIN_TEXT = [
    r"^\.js$", r"^text$", r"^json$", r"^app/json$", r"^plain/text$",
    r"^text/\*$", r"^text/plain$", r"^text/text$", r"^text/ascii$",
    r"^text/txtcharset=utf-8$",
    # the entire text/* family except html/css/js aliases claimed earlier
    r"^text/x?-?(js|xml|srt|rtf|csv|vtt|c|sh|json|yaml|go|log|tex|wiki|diff|"
    r"perl|chdr|csrc|csh|vcard|ndjson|bibtex|python|vcalendar|component|"
    r"html-parts|amzn-ion|handlebars-template|comma-separated-values)$",
    r"^text/(calendar|turtle|webloc|uri-list|markdown|directory|javsacript|"
    r"ecmascript|event-stream)$",
    r"^text/vnd\.(graphviz|reddit\.partial\+html|turbo-stream\.html|"
    r"trolltech\.linguist)$",
    r"^text/0\.4/hammer\.min\.js$",
    # JSON application family (anything +json, plus exact aliases)
    r"^application/json$", r"^application/text$", r"^application/jsonp?$",
    r"^application/json-p$", r"^application/x-ndjson$",
    r"^application/json,charset=.*", r"^application/jsoncharset=UTF-8$",
    r"^application/[\w.\-]+\+json$", r"^application/vnd\.[\w.\-]+\+json$",
    r"^application/(expanded|problem|stream|schema|geo|feed|hal|hr|ion|ld)"
    r"\+json$",
    r"^application/v3\.2[45]\+json$", r"^application/x-amz-json-1\.[01]$",
    r"^application/json\+protobuf$", r"^application/json\+containerv1-server$",
    r"^application/json-amazonui-streaming$",
    r"^application/amazonui-streaming-json$",
    r"^application/json,application/json$",
    r"^:application/application/json$", r"^Content-Type:application/json$",
    r"^applicaiton/jasvascript$", r"^model/gltf\+json$",
]

_FONT = [
    r"^woff2?$", r"^file/woff$", r"^text/woff$", r"^image/otf$",
    r"^fonts?/[\w.\-]+$", r"^x-font/(ttf|woff)$", r"^\(null\)/woff2$",
    r"^application/(x-)?font-?(woff2?|ttf|otf|sfnt)?$",
    r"^application/x-font-(truetype|opentype|woff2?|ttf|otf)$",
    r"^application/font/woff2$", r"^application/vnd\.ms-fontobject$",
    r"^application/font-woff2,font/woff2$", r"^application/ttf$",
    r"^application/woff2?$", r"^value=application/x-font-woff2$",
]

_VIDEO = [
    r"^video/[\w.\-]+$", r"^application/(ogg|wmv|avi|mp4)$",
    r"^application/x-mpegurl$", r"^application/vnd\.ms-asf$",
    r"^application/x-shockwave-flash$", r"^application/vnd\.apple\.mpegurl$",
    r"^application/vnd\.adobe\.flash\.movie$",
    r"^application/mp4,audio/mp4,video/mp4,video/vnd\.objectvideo$",
]

_AUDIO = [
    # (sp-)midi is excluded so the later-registered midi group claims it,
    # matching the reference's exact-alias audio list
    r"^audio/(?!(sp-)?midi$)[\w.\-]+$", r"^application/mp3$",
    r"^application/vnd\.rn-realmedia$",
]

_PDF = [
    r"^adobe/pdf$", r"^image/pdf$", r"^application/\.?(x-)?pdf$",
    r"^,application/pdf$", r"^application/pdfcontent-length:.*",
    r"^application/x-www-form-urlencoded,.+",
    r"^application/pdf,application/pdf$",
    r"^binary/octet-stream,application/pdf$",
]

_DOC = [
    r"^application/(doc|docx|xls|xlsx|msword|msexcel|ms-excel|x-msword|"
    r"x-msexcel|x-cbr|x-cbz)$",
    r"^application/vnd\.(visio|ms-word|ms-excel|freelog\.comic|"
    r"ms-officetheme|ms-visio\.drawing)$",
    r"^application/vnd\.ms-(word|excel|powerpoint)\..*",
    r"^application/vnd\.oasis\.opendocument\..*",
    r"^application/vnd\.openxmlformats-officedocument\..*",
    r"^application/vnd\.openxmlformats-officedocument$",
]

_DATABASE = [
    r"^application/(x-)?sql$", r"^application/(x-)?msaccess$",
]

_TORRENT = [r"^application/x-bittorrent$"]

_COMIC = [
    r"^application/x-cb[rz]$",
    r"^application/vnd\.comicbook(\+zip|-rar)$",
]

_COMPRESSED = [
    r"^zip$", r"^multipart/x-zip$",
    r"^application/\.?(zip|rar|gzip)$",
    r"^application/x-(zip|rar|tar|gtar|lzma|gzip|bzip2?|xz|7z-compressed|"
    r"rar-compressed|zip-compressed|gtar-compressed|compress|tar-gz)$",
    r"^application/vnd\.rar$", r"^application/gzipped-tar$",
    r"^application/zip-compressed$", r"^application/vnd\.ms-cab-compressed$",
    r"^application/x-zip-compressedcontent-length:.*",
    r"^application/vnd\.adobe\.air-application-installer-package\+zip$",
]

_MIDI = [r"^audio/(sp-)?midi$"]

_HTML = [
    r"^text/html$", r"^application/x?html(\+xml)?$", r"^application/x-php$",
    r"^text/html,text/html.*", r"^text/htmltext/html.*",
    r"^text/fragment\+html$", r"^text/html,? ?charset=.*",
    r"^text/x-html-fragment$", r"^text/vnd\.reddit\.partial\+html$",
]

_IMAGE = [
    r"^image[/\\]?$", r"^image/[\w.\-{}+*]+$", r"^iamge/avif$",
    r"^jpe?g$", r"^\.jpeg$", r"^png$", r"^GIF$", r"^webpx?$", r"^PNG32$",
    r"^img/(png|jpeg)$", r"^JPG_MIME$", r"^video/png$", r"^application/jpg$",
    r"^\(?null\)?/ico$", r"^data:image/png$", r"^image/vnd\.[\w.\-]+$",
    r"^image/x[.\-][\w.\-]+$", r"^image/(png|jpeg),image/(png|jpeg)$",
    r"^text/plain,image/avif$", r"^binary/octet-stream,image/webp$",
]

# Precedence = reference registration order.
_BASE_GROUPS: list[tuple[str, list[str]]] = [
    ("ignore", _IGNORE),
    ("plain_text", _PLAIN_TEXT),
    ("font", _FONT),
    ("video", _VIDEO),
    ("audio", _AUDIO),
    ("pdf", _PDF),
    ("doc", _DOC),
    ("database", _DATABASE),
    ("torrent", _TORRENT),
    ("comic", _COMIC),
    ("compressed", _COMPRESSED),
    ("midi", _MIDI),
    ("html", _HTML),
    ("image", _IMAGE),
]

# groups that receive the octet-stream aliases (reference :940-958);
# "font" is first in dispatch order, so octet types route there.
_OCTET_GROUPS = {
    "database", "image", "midi", "audio", "video", "pdf", "doc", "font",
    "torrent", "comic", "compressed",
}

ROUTES = [name for name, _ in _BASE_GROUPS]


@lru_cache(maxsize=4)
def route_groups(use_octet_stream: bool = config.USE_OCTET_STREAM) -> tuple:
    """Ordered (route, patterns) with octet aliases appended per config."""
    out = []
    for name, pats in _BASE_GROUPS:
        pats = list(pats)
        if use_octet_stream and name in _OCTET_GROUPS:
            pats += [p for p in OCTETSTREAM_ALIASES if p not in pats]
        out.append((name, tuple(pats)))
    return tuple(out)


# --------------------------------------------------------------------------
# Python-side router (tests / pandas batches)
# --------------------------------------------------------------------------

@lru_cache(maxsize=4)
def _compiled_groups(use_octet_stream: bool = config.USE_OCTET_STREAM):
    return [
        (name, re.compile("(?:" + "|".join(pats) + ")", re.IGNORECASE | re.UNICODE))
        for name, pats in route_groups(use_octet_stream)
    ]


def sanitize_content_type(content_type: str) -> str:
    """Raw header → ``type/subtype`` (reference sanitize_content_type,
    playwrightcrawler.py:4073-4103)."""
    if not content_type:
        return ""
    ct = content_type.strip()
    ct = re.sub(r'^"(.*)"$', r"\1", ct)
    ct = re.sub(r"^content-type:\s*", "", ct, flags=re.IGNORECASE)
    ct = re.sub(r"^(.*?);.*$", r"\1", ct)
    return re.sub(r"\s+", "", ct)


def route_for(content_type: str, use_octet_stream: bool = config.USE_OCTET_STREAM) -> str:
    """First-match route name for a sanitized content type; unmatched types
    fall to 'unknown' (the reference simply never dispatches them)."""
    for name, rx in _compiled_groups(use_octet_stream):
        if rx.search(content_type or ""):
            return name
    return "unknown"


# --------------------------------------------------------------------------
# Spark column builders (pure SQL — codegen'd, no Python at runtime)
# --------------------------------------------------------------------------

def sanitize_content_type_col(col: Column) -> Column:
    """Column version of ``sanitize_content_type`` via chained
    regexp_replace (kept JVM-side on purpose)."""
    c = F.trim(F.coalesce(col, F.lit("")))
    c = F.regexp_replace(c, r'^"(.*)"$', r"$1")
    c = F.regexp_replace(c, r"(?i)^content-type:\s*", "")
    c = F.regexp_replace(c, r"^(.*?);.*$", r"$1")
    return F.regexp_replace(c, r"\s+", "")


def route_col(ctype: Column, use_octet_stream: bool = config.USE_OCTET_STREAM) -> Column:
    """The dispatch CASE WHEN: one rlike per group, order = precedence."""
    expr = None
    for name, pats in route_groups(use_octet_stream):
        pattern = "(?iu)(?:" + "|".join(pats) + ")"
        cond = ctype.rlike(pattern)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise("unknown")


# --------------------------------------------------------------------------
# Extension → expected route (reference EXTENSION_MAP,
# playwrightcrawler.py:969-1080) for the fast-extension pass (X7/X8).
# --------------------------------------------------------------------------

EXTENSION_ROUTE: dict[str, str] = {}
for _ext_list, _route in [
    (["aac", "aif", "flac", "m4a", "mp3", "ogg", "rm", "s3m", "wav", "xm",
      "webm"], "audio"),
    (["z", "lz", "7z", "gz", "zip", "bz2", "lzma", "cab", "rar"], "compressed"),
    (["sql", "mdb"], "database"),
    (["cbr", "cbz"], "comic"),
    (["doc", "docx", "vsd", "xls", "xlsx"], "doc"),
    (["ttf", "otf", "pfb", "eot", "ttc", "woff", "woff2"], "font"),
    (["aces", "apng", "avci", "avcs", "avif", "bmp", "cgm", "cur", "dpx",
      "emf", "example", "fits", "g3fax", "gif", "heic", "heif", "hej2k",
      "ico", "ief", "j2c", "jaii", "jais", "jls", "jp2", "jpeg", "jpg",
      "jphc", "jph", "jpm", "jpx", "jxl", "jxra", "jxr", "jxrs", "jxsc",
      "jxs", "jxsi", "jxss", "ktx2", "ktx", "naplps", "pbf", "png", "pnj",
      "psd", "svg", "t38", "tiff", "webp", "wmf"], "image"),
    (["mid", "midi"], "midi"),
    (["pdf"], "pdf"),
    (["torrent"], "torrent"),
    (["3gp", "asf", "flv", "m3u8", "m4s", "mkv", "mov", "mp4", "mpg",
      "mpeg", "ogv", "swf", "wm", "wmv"], "video"),
]:
    for _e in _ext_list:
        EXTENSION_ROUTE[_e] = _route


def expected_route_for_extension_col(ext: Column) -> Column:
    """Map file_extension → expected route ('' when unmapped); used for the
    extension↔content-type consistency check (reference :2794-2801)."""
    pairs = ",".join(f"{k}:{v}" for k, v in EXTENSION_ROUTE.items())
    mapping = F.expr(f"str_to_map('{pairs}', ',', ':')")
    return F.coalesce(F.element_at(mapping, F.lower(ext)), F.lit(""))
