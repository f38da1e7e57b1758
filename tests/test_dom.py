from markdown_lab_ray.kernels.dom import parse_html, parse_selector


def test_basic_tree():
    root = parse_html("<html><body><p>Hello <b>world</b></p></body></html>")
    ps = root.select("p")
    assert len(ps) == 1
    assert ps[0].text_content() == "Hello world"


def test_select_by_id_and_class():
    root = parse_html('<div id="content"><span class="a b">x</span></div>')
    assert root.select_one("#content") is not None
    assert root.select_one(".a") is not None
    assert root.select_one(".a.b") is not None
    assert root.select_one(".c") is None


def test_attr_selector():
    root = parse_html('<a href="/x">l</a><a>none</a>')
    assert len(root.select("a[href]")) == 1
    assert len(root.select("a")) == 2


def test_comma_group_document_order():
    root = parse_html("<pre>one</pre><code>two</code><pre><code>three</code></pre>")
    els = root.select("pre, code")
    texts = [e.text_content() for e in els]
    # pre(one), code(two), pre(three), code(three): pre-order
    assert texts == ["one", "two", "three", "three"]


def test_entities_decoded():
    root = parse_html("<p>a &amp; b &lt;c&gt;</p>")
    assert root.select("p")[0].text_content() == "a & b <c>"


def test_void_and_implied_close():
    root = parse_html("<ul><li>one<li>two</ul><img src='x'>")
    items = [li.text_content() for li in root.select("li")]
    assert items == ["one", "two"]
    assert len(root.select("img[src]")) == 1


def test_nested_list_descendants():
    root = parse_html("<ul><li>a<ul><li>b</li></ul></li></ul>")
    uls = root.select("ul")
    assert len(uls) == 2
    # outer ul sees both li descendants
    assert len(uls[0].select("li")) == 2
    assert len(uls[1].select("li")) == 1


def test_malformed_tolerated():
    root = parse_html("<div><p>unclosed<div>deep" * 50)
    assert root is not None
    root2 = parse_html("")
    assert root2.select("p") == []


def test_selector_parse():
    comps = parse_selector("main, article, #content, .content")
    assert len(comps) == 4
