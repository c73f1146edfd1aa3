"""Differential tests for the streaming HTML extractor.

`_stream_extract` is the no-tree fast path; `_tree_extract` (build a
_Node tree, walk it) is the semantic reference and bail target. The
contract: on every document where the streamer does not bail, its spans
are EXACTLY the tree path's, and it bails exactly where _fast_parse
bails (so the two-tier degrade ladder is unchanged). These tests pin
that equivalence on the generated corpus shape, a handcrafted
adversarial battery, and a seeded structural fuzz.
"""

import random

import pytest

from docling_fast_server_spark.corpus import render_html
from docling_fast_server_spark.operators.html_extract import (
    _fast_parse,
    _FurnitureBail,
    _stream_extract,
    _tree_extract,
)

ADVERSARIAL = [
    # malformed nesting / close tags (nearest-match pop semantics)
    "<div><p>a</div>b</p>",
    "<p>a<div>b</div></p>",
    "<p>a",
    "<body><p>x</p>stray</body>",
    "</p><p>hi</p></div>",
    "<p><span>a</p>",
    "<div><ul><li>x</li></ul>",
    # furniture in and around blocks
    "<nav><ul><li><a href='/x'>x</a></li></ul></nav><p>body</p>",
    "<div>text<nav>menu</nav>more</div>",
    "<p>keep<aside>drop</aside>tail</p>",
    "<nav/><p>after-void-nav</p>",
    "<header>h</header><main><p>m</p></main><footer>f</footer>",
    # tables: cell capture, unclosed cells, nesting, selfclose, ids
    "<table id='tbl-3'><tr><td>a</td><td>b</td></tr></table>",
    "<table><td>a<td>b</table>",
    "<table><td>a",
    '<table id="tbl-9"><thead><tr><th>H</th></tr></thead>'
    "<tbody><tr><td>x</td></tr></tbody></table>",
    "<table><tr><td><table><tr><td>inner</td></tr></table></td></tr></table>",
    "<table><table><td>x</td></table></table>",
    "<table><td/></table>",
    "<table></table>",
    "<table id='tbl-x'><td>q</td></table>",
    # dl: first-DIRECT-child dt/dd only
    "<dl><dt>k</dt><dd>v</dd></dl>",
    "<dl><dt>a<dt>b</dl>",
    "<dl><dt>a</dt><dt>b</dt><dd>v</dd><dd>w</dd></dl>",
    "<dl><div><dt>x</dt></div><dd>v</dd></dl>",
    "<dl><dd>only-v</dd></dl>",
    "<dl></dl>",
    "<dl><dt/><dd/></dl>",
    # figure: first direct img decides, even without src
    "<figure><img src='a.png'/><img src='b.png'/></figure>",
    "<figure><div><img src='deep.png'/></div></figure>",
    "<figure><img alt='no-src'/></figure>",
    "<figure/>",
    "<figure></figure>",
    "<figure><img src=unquoted.png></figure>",
    # boilerplate screens
    "<p><a href='/x'>all link text here</a></p>",
    "<p>mostly text <a href='/x'>l</a> more words here to dilute</p>",
    "<div>SHOUTING CHROME BUY NOW CLICK</div>",
    "<ul><li><a href='/a'>a</a></li><li><a href='/b'>b</a></li></ul>",
    "<h1>ALL CAPS HEADING OK</h1>",
    "<p></p>",
    "<p/>",
    "<div/>",
    # entities / comments / doctype / case-insensitivity
    "<!DOCTYPE html><!-- c --><P>Mixed &amp; Case &lt;tag&gt;</P>",
    "<p>a &nbsp; b</p>",
    "<pre><code>x = 1 &amp;&amp; 2</code></pre>",
    "<div class='math extra'>E = m c^2</div>",
    "<div class='mathy'>E</div>",
    "<DIV CLASS='math'>caps attr</DIV>",
    # link-depth tracking
    "<a href='/x'><p>inside outer link</p></a>",
    "<p><a>one</a><a>two</a></p>",
    "<p><a><b>bold link</b></a> rest of much longer text here</p>",
    # interleaved text and element siblings (document-order regression:
    # the tree walk's eager string emit scrambled this to "ba")
    "<p>a<br>b</p>",
    "<p>a</a>b</p>",
    "<p>pre <b>bold</b> mid <i>ital</i> post</p>",
    # strays
    "<blockquote>quoted text</blockquote>",
    "<main>no blocks here just text</main>",
    "<p>tail after last tag</p>trailing",
    "trailing only, no tags at all",
    "<td>cell outside table</td>",
    "<dt>dt outside dl</dt>",
]

BAIL_CASES = [
    "<nav><figure><img src='s'/></figure></nav><p>x</p>",  # figure in chrome
    # a </section> inside the furniture that matches an OPEN ancestor
    # outside it — the tree semantics would pop out of the subtree
    "<section><nav><p>a</section></nav><p>b</p></section>",
]


def _both(html: str, doc_num: int = 7):
    try:
        s = _stream_extract(html, doc_num)
        sbail = False
    except _FurnitureBail:
        s, sbail = None, True
    try:
        _fast_parse(html)
        tbail = False
    except _FurnitureBail:
        tbail = True
    except Exception:
        tbail = False
    return s, sbail, tbail


@pytest.mark.parametrize("html", ADVERSARIAL)
def test_stream_matches_tree_adversarial(html):
    s, sbail, tbail = _both(html)
    assert sbail == tbail, "streaming must bail exactly where _fast_parse bails"
    if not sbail:
        assert s == _tree_extract(html, 7)


@pytest.mark.parametrize("html", BAIL_CASES)
def test_stream_bails_with_fast_parse(html):
    _, sbail, tbail = _both(html)
    assert sbail and tbail


def test_stream_matches_tree_on_generated_corpus():
    for doc_id in range(0, 600, 2):
        text = " ".join(f"w{doc_id}x{k}" for k in range(80))
        html = render_html(doc_id, text)
        assert _stream_extract(html, doc_id) == _tree_extract(html, doc_id)


def test_document_order_with_interleaved_inline_markup():
    # the regression the streaming differential flushed out of the tree
    # path: strings and element siblings must emit in document order
    got = _tree_extract("<p>a<br>b</p>", 0)
    assert got == [{"kind": "text", "text": "ab", "media_ref": None, "offset": 0}]
    got = _stream_extract("<p>x <b>y</b> z</p>", 0)
    assert got[0]["text"] == "x y z"


_FUZZ_TAGS = [
    "p", "div", "ul", "ol", "li", "span", "a", "b", "table", "tr", "td",
    "th", "dl", "dt", "dd", "figure", "img", "pre", "code", "h1", "h2",
    "nav", "aside", "footer", "header", "main", "section", "blockquote",
    "br", "hr",
]
_FUZZ_WORDS = [
    "alpha", "BETA", "gamma", "DELTA CHROME", "x", "&amp;",
    "longer words here to dilute density",
]


def _rand_html(r: random.Random) -> str:
    parts = []
    for _ in range(r.randint(1, 40)):
        roll = r.random()
        if roll < 0.35:
            parts.append(r.choice(_FUZZ_WORDS) + " ")
        elif roll < 0.65:
            t = r.choice(_FUZZ_TAGS)
            attrs = ""
            if r.random() < 0.3:
                attrs = (
                    f" id='tbl-{r.randint(0, 9)}'"
                    if r.random() < 0.5
                    else " class='math'"
                )
            if t == "img" and r.random() < 0.7:
                attrs += f" src='m{r.randint(0, 9)}.png'"
            sc = "/" if r.random() < 0.15 else ""
            parts.append(f"<{t}{attrs}{sc}>")
        else:
            parts.append(f"</{r.choice(_FUZZ_TAGS)}>")
    return "".join(parts)


def test_stream_matches_tree_fuzz():
    r = random.Random(20260817)
    bails = mismatches = 0
    for _ in range(4000):
        html = _rand_html(r)
        s, sbail, tbail = _both(html, 3)
        if sbail != tbail:
            mismatches += 1
            continue
        if sbail:
            bails += 1
            continue
        if s != _tree_extract(html, 3):
            mismatches += 1
    assert mismatches == 0
    assert bails > 100  # the generator does reach the bail constructs


def _rand_html_hostile(r: random.Random) -> str:
    """Second fuzz shape: attribute values containing angle brackets and
    quotes, entity runs, CRLF/tab whitespace, deep nesting, stray
    brackets — the tokenizer-hazard corner of the input space."""
    parts = []
    depth = 0
    for _ in range(r.randint(1, 60)):
        roll = r.random()
        if roll < 0.3:
            parts.append(
                r.choice(
                    [
                        "a &lt; b &gt; c",
                        "&amp;&amp;",
                        "x\r\n\ty",
                        "lone < bracket",
                        "gt > here",
                        "&#65;&#x42;",
                        "plain words and more of them",
                    ]
                )
            )
        elif roll < 0.6:
            t = r.choice(_FUZZ_TAGS)
            attrs = r.choice(
                [
                    "",
                    ' title="a>b"',
                    " title='</p>'",
                    ' class="math"',
                    ' id="tbl-2" data-x="<div>"',
                    " src='q>r.png'",
                ]
            )
            parts.append(f"<{t}{attrs}>")
            depth += 1
        elif roll < 0.9 and depth:
            parts.append(f"</{r.choice(_FUZZ_TAGS)}>")
            depth -= 1
        else:
            parts.append(r.choice(["</", "< p>", "<>", "<3", "</ div>"]))
    return "".join(parts)


def test_stream_matches_tree_fuzz_hostile():
    r = random.Random(8675309)
    mismatches = 0
    for _ in range(4000):
        html = _rand_html_hostile(r)
        s, sbail, tbail = _both(html, 5)
        if sbail != tbail:
            mismatches += 1
            continue
        if not sbail and s != _tree_extract(html, 5):
            mismatches += 1
    assert mismatches == 0
