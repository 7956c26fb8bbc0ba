"""Load selected *pure* functions from the read-only reference repo for
parity testing.

The reference module can't be imported whole (it imports playwright,
elasticsearch, PIL, ... none of which exist here), so we AST-extract just
the self-contained functions under test and exec them in a namespace that
provides their stdlib imports and config globals. Nothing is copied into
this repo — the source of truth stays ``/root/reference``.

If the reference tree is absent, parity tests are skipped (the engine's own
golden fixtures still run).
"""

from __future__ import annotations

import ast
import hashlib
import re
from collections import Counter
from pathlib import Path, PurePosixPath
from urllib.parse import parse_qs, unquote, urljoin, urlparse, urlsplit, urlunsplit

REFERENCE = Path("/root/reference/playwrightcrawler.py")
REFERENCE_DOWNLOADER = Path("/root/reference/downloader.py")

PURE_FUNCTIONS = {
    "sanitize_url",
    "has_repeated_segments",
    "get_directory_tree",
    "extract_top_words_from_text",
    "is_open_directory",
    "sanitize_content_type",
    "get_host_levels",
    "get_directory_levels",
    "url_to_id",
    "is_embedded_url",
}

DOWNLOADER_FUNCTIONS = {
    "safe_filepath_from_url",
    "regexes_to_es_regexp",
}

# config globals the extracted functions close over
# (values from /root/reference/config.py)
_REF_GLOBALS = dict(
    re=re,
    hashlib=hashlib,
    urlsplit=urlsplit,
    urlunsplit=urlunsplit,
    urlparse=urlparse,
    urljoin=urljoin,
    unquote=unquote,
    parse_qs=parse_qs,
    PurePosixPath=PurePosixPath,
    Counter=Counter,
    WORDS_REMOVE_SPECIAL_CHARS=True,
    WORDS_TO_LOWER=True,
    WORDS_MIN_LEN=3,
    WORDS_MAX_LEN=40,
    WORDS_MAX_WORDS=24000,
    MAX_DIR_LEVELS=7,
    MAX_HOST_LEVELS=7,
    LINKS_INDEX="crawler-links",
    RANDOM_SITES_QUEUE=10000,
    print=lambda *a, **k: None,  # silence the reference's chatty logging
)


def _extract(source: Path, names: set[str], extra_globals: dict) -> dict:
    tree = ast.parse(source.read_text())
    ns = {**_REF_GLOBALS, **extra_globals}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in names:
            mod = ast.Module(body=[node], type_ignores=[])
            exec(compile(mod, str(source), "exec"), ns)  # noqa: S102
    return {n: ns[n] for n in names if n in ns}


def load_reference_functions() -> dict | None:
    """Return {name: callable} for PURE_FUNCTIONS (+ downloader functions),
    or None if unavailable."""
    if not REFERENCE.exists():
        return None
    import os

    from urllib.parse import quote

    found = _extract(REFERENCE, PURE_FUNCTIONS, {})
    if REFERENCE_DOWNLOADER.exists():
        # OUTPUT_DIR outside the repo: the reference function makedirs()
        # eagerly; parity tests compare returned paths only
        found.update(
            _extract(
                REFERENCE_DOWNLOADER,
                DOWNLOADER_FUNCTIONS,
                {"os": os, "quote": quote, "OUTPUT_DIR": "/tmp/pwc_ref_downloads"},
            )
        )
    return found or None
