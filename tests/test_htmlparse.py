"""HTML→text extraction tests (myhtmlparse.cc rules: script/style skip,
pending-space whitespace normalization, title/meta capture, entities)."""

from xapian_spark.analysis.htmlparse import (
    HtmlTextExtractor,
    decode_entities,
    extract_fields,
    extract_text,
)


def test_basic_normalization():
    assert extract_text(b"<html><body>hello   world</body></html>") == (
        "hello world"
    )
    # leading/trailing whitespace never emitted
    assert extract_text(b"<body>  x  </body>") == "x"
    assert extract_text(b"<body>\n\t a \n b \t</body>") == "a b"


def test_script_style_skipped():
    h = b"<body>keep<script>var x = 'drop me';</script>this</body>"
    assert extract_text(h) == "keep this"
    h = b"<body>a<style>p { color: red }</style>b</body>"
    assert extract_text(h) == "a b"
    # nested/unclosed script content must not leak
    h = b"<body>a<script>if (x < 3) { y(); }</script>b</body>"
    assert extract_text(h) == "a b"


def test_inline_vs_block_tags():
    # inline tags do not split words
    assert extract_text(b"<body>ab<b>cd</b>ef</body>") == "abcdef"
    # block tags force a word break
    assert extract_text(b"<body><p>one</p><p>two</p></body>") == "one two"
    assert extract_text(b"<body>one<br>two</body>") == "one two"
    assert extract_text(b"<ul><li>a</li><li>b</li></ul>") == "a b"


def test_title_not_in_dump():
    h = b"<html><head><title>My Title</title></head><body>body text</body>"
    f = extract_fields(h)
    assert f["title"] == "My Title"
    assert f["text"] == "body text"


def test_meta_fields():
    h = (
        b'<head><meta name="keywords" content="alpha, beta">'
        b'<meta name="description" content="a sample">'
        b'<meta name="author" content="Jo Writer"></head><body>x</body>'
    )
    f = extract_fields(h)
    assert f["keywords"] == "alpha, beta"
    assert f["sample"] == "a sample"
    assert f["author"] == "Jo Writer"
    assert f["indexing_allowed"] is True


def test_meta_robots_noindex():
    h = b'<head><meta name="robots" content="noindex,nofollow"></head>x'
    assert extract_fields(h)["indexing_allowed"] is False


def test_comments_and_entities():
    assert extract_text(b"a<!-- hidden <b>junk</b> -->b") == "ab"
    assert decode_entities("fish &amp; chips") == "fish & chips"
    assert decode_entities("&#65;&#x42;") == "AB"
    assert extract_text(b"<body>fish &amp; chips &lt;now&gt;</body>") == (
        "fish & chips <now>"
    )


def test_deterministic():
    h = (
        b"<html><head><title>T</title></head><body><p>Hello   World</p>"
        b"<script>junk()</script><div>again</div></body></html>"
    )
    assert extract_text(h) == extract_text(h) == "Hello World again"


def test_extractor_reusable_and_stateless():
    ex = HtmlTextExtractor()
    assert ex.parse("<p>a</p>").dump == "a"
    assert ex.parse("<p>b</p>").dump == "b"
