"""DOM-fidelity main-content extraction — the documented next rung
behind strip_html's signature (operators/text.py): where strip_html is
the scalable regexp 95% path that keeps EVERY visible character,
this stage parses the markup into text blocks and drops boilerplate
blocks (navigation, sidebars, footers, link farms) the way
trafilatura/boilerpipe-class extractors do, so what reaches the
corpus is the article, not the chrome around it.

Method: the shallow-text-feature block classifier of Kohlschütter,
Fankhauser & Nejdl, "Boilerplate Detection using Shallow Text
Features" (WSDM 2010, the boilerpipe NumWordsRulesClassifier) — block
word count and link density of the current/previous/next block are
near-optimal features for the content/boilerplate split, and need no
model file:

    link_density(curr) >  1/3                     -> boilerplate
    link_density(prev) <= 0.555:
        content iff words(curr) > 16 or words(next) > 15
                    or words(prev) > 4
    else (link-dense neighborhood):
        content iff words(curr) > 40 or words(next) > 17

plus trafilatura-style semantic DOM pruning ON TOP of the shallow
classifier: blocks inside <nav>/<aside>/<footer>/<form> subtrees are
boilerplate regardless of their text shape — a prose-heavy footer
("© 2026 Example Media. All articles are the property of ...") beats
any link-density rule, but the page said what it was. <header> is
deliberately NOT pruned: article headlines commonly live in a header
element, and the classifier handles the masthead case.

Parsing uses the stdlib html.parser (tolerant, tokenizer-level — the
same degradation story as the regexp path: malformed markup yields
odd blocks, never errors) with convert_charrefs=True, so ALL named
and numeric entities decode (a superset of strip_html's common-entity
table). script/style/noscript/template/head subtrees never emit text.

Spark shape: an Arrow-batched mapInPandas stage, exactly the
compression_ratio / binary-codec escape hatch (SURVEY §2.11) — the
classifier is inherently a DOM pass, not a Catalyst expression. The
stage is map-only: no shuffle at any corpus size, scales like any
narrow projection. Run it INSTEAD of strip_html when boilerplate
recall matters more than keep-everything fidelity; both share the
(df, html_col, out_col) contract so pipelines swap one line.
"""

from __future__ import annotations

from html.parser import HTMLParser

from pyspark.sql import DataFrame

#: tags that delimit text blocks (block-level boundaries); inline tags
#: (a, span, em, b, ...) continue the current block.
_BLOCK_TAGS = {
    "p", "div", "br", "li", "tr", "td", "th", "h1", "h2", "h3", "h4",
    "h5", "h6", "section", "article", "blockquote", "pre", "ul", "ol",
    "table", "nav", "aside", "footer", "header", "form", "figure",
    "figcaption", "main", "hr",
}

#: subtrees whose text is never content.
_SKIP_SUBTREES = {"script", "style", "noscript", "template", "head"}

#: semantic page-chrome subtrees: always boilerplate (see module
#: docstring for why <header> is not here).
_CHROME_SUBTREES = {"nav", "aside", "footer", "form"}


class _BlockParser(HTMLParser):
    """Segment HTML into (text, n_words, n_link_words, in_chrome)
    blocks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int, bool]] = []
        self._parts: list[str] = []
        self._link_parts: list[str] = []
        self._skip_depth = 0
        self._chrome_depth = 0
        self._link_depth = 0
        self.saw_markup = False

    def _flush(self) -> None:
        text = " ".join("".join(self._parts).split())
        if text:
            # link words are counted with the SAME join-then-split
            # normalization as the block text, so inline tags inside a
            # link ('foo<b>bar</b>' — data chunks "foo","bar") count as
            # one word both ways and link_density can never exceed 1
            # from chunk splitting (ADVICE r8)
            n_link = len("".join(self._link_parts).split())
            self.blocks.append(
                (text, len(text.split()), n_link,
                 self._chrome_depth > 0)
            )
        self._parts = []
        self._link_parts = []

    def handle_starttag(self, tag, attrs):
        self.saw_markup = True
        if tag in _BLOCK_TAGS:
            # flush BEFORE entering a chrome subtree so the preceding
            # block keeps its own chrome verdict
            self._flush()
        if tag in _SKIP_SUBTREES:
            self._skip_depth += 1
        elif tag in _CHROME_SUBTREES:
            self._chrome_depth += 1
        elif tag == "a":
            self._link_depth += 1

    def handle_startendtag(self, tag, attrs):
        self.saw_markup = True
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _BLOCK_TAGS:
            # flush BEFORE leaving the subtree so a chrome block is
            # still marked chrome
            self._flush()
        if tag in _SKIP_SUBTREES:
            # max() guards unbalanced close tags in broken markup
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _CHROME_SUBTREES:
            self._chrome_depth = max(0, self._chrome_depth - 1)
        elif tag == "a":
            self._link_depth = max(0, self._link_depth - 1)

    def handle_data(self, data):
        if self._skip_depth == 0 and data:
            self._parts.append(data)
            if self._link_depth > 0:
                self._link_parts.append(data)

    def close(self):
        super().close()
        self._flush()


def _classify(blocks: list[tuple[str, int, int, bool]]) -> list[bool]:
    """Kohlschütter NumWordsRulesClassifier over the block sequence.
    Semantic-chrome blocks are boilerplate AND are removed from the
    sequence BEFORE classification (prune-then-classify, the
    trafilatura order): a nav bar must not serve as the "link-dense
    previous block" context that demotes the article's first
    paragraph. Returns one is-content verdict per input block."""
    seq = [(idx, b) for idx, b in enumerate(blocks) if not b[3]]
    n = len(seq)

    def words(i: int) -> int:
        return seq[i][1][1] if 0 <= i < n else 0

    def link_density(i: int) -> float:
        if not 0 <= i < n or seq[i][1][1] == 0:
            return 0.0
        return seq[i][1][2] / seq[i][1][1]

    verdicts = [False] * len(blocks)
    for i in range(n):
        if link_density(i) > 1 / 3:
            ok = False
        elif link_density(i - 1) <= 0.555:
            ok = words(i) > 16 or words(i + 1) > 15 or words(i - 1) > 4
        else:
            ok = words(i) > 40 or words(i + 1) > 17
        verdicts[seq[i][0]] = ok
    return verdicts


def extract_text(html: str) -> tuple[str, int, int]:
    """Plain-Python core: (content_text, n_content_blocks,
    n_boilerplate_blocks) for one document. Plain text with no markup
    at all passes through as one content block (it is not a web page;
    classifying a tweet-length plain document as boilerplate would
    silently empty non-HTML corpora) — a PAGE whose every block fails
    the classifier honestly yields '', which the downstream token gate
    then drops."""
    if html is None:
        return "", 0, 0
    p = _BlockParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # tokenizer-level failures on garbage bytes: degrade to empty
        return "", 0, len(p.blocks)
    if not p.saw_markup:
        text = " ".join(html.split())
        return text, 1 if text else 0, 0
    verdicts = _classify(p.blocks)
    kept = [b[0] for b, v in zip(p.blocks, verdicts) if v]
    return "\n\n".join(kept), len(kept), len(p.blocks) - len(kept)


def extract_main_content(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "text",
) -> DataFrame:
    """DataFrame stage: replaces `html_col` with `out_col` (the
    extracted main content) plus `n_content_blocks` /
    `n_boilerplate_blocks` audit counts, via Arrow-batched
    mapInPandas (see module docstring for the method and the
    strip_html trade-off)."""
    from pyspark.sql import types as T

    # fresh StructType: StructType.add mutates in place, and handing a
    # DataFrame's own mutated schema to mapInPandas breaks attribute
    # resolution (the compression_ratio precedent)
    out_fields = [f for f in df.schema.fields if f.name not in (html_col, out_col)]
    schema = T.StructType(
        out_fields
        + [
            T.StructField(out_col, T.StringType()),
            T.StructField("n_content_blocks", T.IntegerType()),
            T.StructField("n_boilerplate_blocks", T.IntegerType()),
        ]
    )
    keep_names = [f.name for f in out_fields]

    def run(batches):
        for pdf in batches:
            res = pdf[html_col].map(extract_text)
            out = pdf[keep_names].copy()
            out[out_col] = res.map(lambda t: t[0])
            out["n_content_blocks"] = res.map(lambda t: t[1]).astype("int32")
            out["n_boilerplate_blocks"] = res.map(lambda t: t[2]).astype("int32")
            yield out

    return df.mapInPandas(run, schema)
