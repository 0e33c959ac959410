"""M1 — deterministic html→text; the per-row byte-identical invariant."""

from knowledgegraph_ray.functions.text_extract import extract_text, prepared_text

GOLDEN = [
    (
        b"<!DOCTYPE html><html><head><title>T</title><script>var x=1;</script>"
        b"</head><body><p>Hello &amp; welcome.</p><p>Bye.</p></body></html>",
        "T\n\nHello & welcome.\n\nBye.",
    ),
    (
        b"<html><body><!-- hidden --><style>p{}</style>"
        b"<div>A<br>B</div><span>C</span></body></html>",
        "A\nB\nC",
    ),
    (b"<html><body><script>void(0)</script></body></html>", ""),
    (
        "<html><body><p>Sarah Jones &lt;s.j@acme.com&gt; works at Acme Corp.</p>"
        "</body></html>",
        "Sarah Jones <s.j@acme.com> works at Acme Corp.",
    ),
]


def test_goldens_byte_identical():
    for html, expected in GOLDEN:
        assert extract_text(html) == expected


def test_idempotent_and_deterministic():
    html = GOLDEN[0][0]
    out = {extract_text(html) for _ in range(50)}
    assert len(out) == 1


def test_bytes_and_str_agree():
    html = GOLDEN[3][0]
    assert extract_text(html) == extract_text(html.decode() if isinstance(html, bytes) else html)


def test_whitespace_collapse():
    assert extract_text(b"<p>a   b\t c</p>\n\n\n\n<p>d</p>") == "a b c\n\nd"


def test_prepared_text_matches_reference_shape():
    # vespa_integration.py:1013 — f"{title}\n\n{content}"
    assert prepared_text("Subject", "Body text") == "Subject\n\nBody text"


def test_generator_text_column_is_extract_text_of_html():
    """Every generated page satisfies text == extract_text(html) per url."""
    from knowledgegraph_ray.sources.pages import generate_pages

    table, _ = generate_pages(60, seed=7)
    for html, text in zip(table.column("html").to_pylist(), table.column("text").to_pylist()):
        assert extract_text(html) == text


def test_generate_pages_range_equivalence():
    """Sharded generation is byte-identical to slicing the full table (the
    per-page seed streams make shards order-independent)."""
    from knowledgegraph_ray.sources.pages import generate_pages

    full, meta = generate_pages(120, seed=9)
    part, pmeta = generate_pages(120, seed=9, start=50, limit=30)
    assert part.equals(full.slice(50, 30))
    assert pmeta == meta[50:80]
