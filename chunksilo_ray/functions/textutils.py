"""Scalar / vectorized text utilities.

Re-implementations (from behavior, not code) of the reference's string
operators: surface tokenization (reference src/chunksilo/index.py:1185-1215),
query preprocessing (search.py:295-304), quoted-phrase extraction
(search.py:307-316), ID-like normalization (search.py:381-425), stopword
filtering (search.py:79-96), line-offset computation (index.py:437-447) and
char-offset -> line binary search (search.py:175-188).

All hot-path callers use these inside ``map_batches`` bodies; the per-string
functions here are deliberately allocation-light and regex-precompiled.
"""

from __future__ import annotations

import bisect
import re

# ~86-word stopword list in the spirit of the reference's Confluence term
# filter (search.py:79-96). Includes the sentence-starter vocabulary of our
# synthetic transcript templates so capitalized sentence heads are never
# mistaken for entity mentions.
STOPWORDS: frozenset[str] = frozenset(
    """a about after again all also an and any are as at be because been before
    being but by can cannot could did do does doing down during each few for
    from further had has have having he her here hers him his how i if in into
    is it its just let me more most my no nor not now of off on once only or
    other our out over own please run check what when where which who why will
    with would should shall may might must the their them then there these they
    that this those through to too under until up very was we were while you
    your yes ok okay thanks see says say said like need want try going back new
    failing error output inspect review points reported contains looking""".split()
)

# token pattern used by the mention scanner: keeps inner -_./ so artifacts like
# "config.yaml", "DATABASE_URL", "ci-pipeline" survive as single raw tokens,
# but tokens must END alphanumeric (no trailing sentence punctuation).
RAW_TOKEN_RE = re.compile(r"[A-Za-z0-9](?:[A-Za-z0-9_\-./]*[A-Za-z0-9])?")

# surface tokenizer: split on delimiters then camelCase (index.py:1185-1215
# behavior: "MyFile_Name-v2.txt" -> my file name v2 txt).
_DELIM_RE = re.compile(r"[_\-./\s]+")
_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")

# ID-like mention normalizer ("abc 1234" / "abc_1234" / "ABC1234" -> abc-1234),
# pattern modeled on the reference's issue-key normalizer (search.py:381-425).
ID_LIKE_RE = re.compile(r"^([A-Za-z]{2,10})[\s_\-]?(\d{1,6})$")

_WS_RE = re.compile(r"\s+")
_QUOTE_RE = re.compile(r'"([^"]+)"')
_WORD_RE = re.compile(r"[A-Za-z0-9]+")


def tokenize_surface(s: str) -> list[str]:
    """Split a surface form on delimiters + camelCase, lowercase, drop empties."""
    parts: list[str] = []
    for piece in _DELIM_RE.split(s):
        if not piece:
            continue
        for sub in _CAMEL_RE.split(piece):
            if sub:
                parts.append(sub.lower())
    return parts


def normalize_surface(s: str) -> str:
    """Canonical textual key for a surface form: id-normalize or token-join."""
    m = ID_LIKE_RE.match(s.strip())
    if m:
        return f"{m.group(1).lower()}-{m.group(2)}"
    return "-".join(tokenize_surface(s))


def preprocess_query(q: str) -> str:
    """Collapse whitespace, strip surrounding space and trailing punctuation
    (search.py:295-304 behavior). Trailing-space re-strip keeps the fn
    idempotent when punctuation removal exposes one ("0 !" -> "0")."""
    q = _WS_RE.sub(" ", q).strip()
    return q.rstrip("?!.,;:").rstrip()


def extract_quoted_phrases(q: str) -> tuple[list[str], str]:
    """Pull "..." phrases out of a query; return (phrases, remainder)
    (search.py:307-316 behavior)."""
    phrases = _QUOTE_RE.findall(q)
    remainder = _WS_RE.sub(" ", _QUOTE_RE.sub(" ", q)).strip()
    return phrases, remainder


def filter_stopwords(tokens: list[str], min_len: int = 2) -> list[str]:
    return [t for t in tokens if len(t) >= min_len and t.lower() not in STOPWORDS]


def compute_line_offsets(text: str) -> list[int]:
    """Char offsets of line starts; starts with [0], one entry per newline
    (index.py:437-447 behavior, tested in reference test_chunk_location.py)."""
    offsets = [0]
    for i, ch in enumerate(text):
        if ch == "\n":
            offsets.append(i + 1)
    return offsets


def char_offset_to_line(offsets: list[int], char_offset: int) -> int:
    """1-indexed line containing char_offset, via binary search
    (search.py:175-188 behavior)."""
    if not offsets:
        return 1
    return bisect.bisect_right(offsets, char_offset)


def build_heading_path(
    headings: list[dict], char_pos: int, key_pos: str = "position", key_text: str = "text"
) -> list[str]:
    """Flat prefix of all headings at/before char_pos (search.py:154-172
    behavior: NOT level-aware, unlike the DOCX splitter)."""
    return [h[key_text] for h in headings if h[key_pos] <= char_pos]


def words(text: str) -> list[str]:
    """Plain word tokens (alnum runs), used by the BoW embedding and stats."""
    return _WORD_RE.findall(text)


def is_id_like(token: str) -> bool:
    return ID_LIKE_RE.match(token) is not None


def clean_syntax_spans(html: str) -> str:
    """Unwrap syntax-highlighting ``<span>`` tags, keeping their contents
    (reference ``confluence_html_formatter.py:16-52``: Confluence wraps code
    in per-token spans with color/background styles or code-* classes that
    break downstream markdown conversion). A span qualifies when its style
    contains ``color``/``background`` or any class contains ``code``.

    Stdlib ``html.parser`` reconstruction (bs4-free): non-span markup is
    emitted verbatim via ``get_starttag_text``; entity/char refs are kept
    raw. Pure string transform — usable inside any map_batches stage."""
    if not html:
        return html

    from html.parser import HTMLParser

    class _Unwrap(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=False)
            self.out: list[str] = []
            # per-open-span flag stack: True = stripped (emit nothing)
            self.span_stack: list[bool] = []

        @staticmethod
        def _is_syntax(attrs) -> bool:
            d = dict(attrs)
            style = (d.get("style") or "").lower()
            classes = (d.get("class") or "").lower().split()
            return (
                "color" in style
                or "background" in style
                or any("code" in c for c in classes)
            )

        def handle_starttag(self, tag, attrs):
            if tag == "span":
                strip = self._is_syntax(attrs)
                self.span_stack.append(strip)
                if strip:
                    return
            self.out.append(self.get_starttag_text())

        def handle_startendtag(self, tag, attrs):
            if tag == "span" and self._is_syntax(attrs):
                return  # self-closing syntax span has no contents to keep
            self.out.append(self.get_starttag_text())

        def handle_endtag(self, tag):
            if tag == "span" and self.span_stack:
                if self.span_stack.pop():
                    return
            self.out.append(f"</{tag}>")

        def handle_data(self, data):
            self.out.append(data)

        def handle_entityref(self, name):
            self.out.append(f"&{name};")

        def handle_charref(self, name):
            self.out.append(f"&#{name};")

        def handle_comment(self, data):
            self.out.append(f"<!--{data}-->")

        def handle_decl(self, decl):
            self.out.append(f"<!{decl}>")

    p = _Unwrap()
    p.feed(html)
    p.close()
    return "".join(p.out)
