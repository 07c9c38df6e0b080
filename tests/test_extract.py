"""HTML extractor: frozen pure function + byte-identical-per-url invariant."""

from climatemind_ontology_processing_ray.sources.pages import generate_pages
from climatemind_ontology_processing_ray.stages.extract import extract_text


def test_strips_script_style_comments():
    html = b"<html><head><style>x{}</style><script>var a=1;</script></head><body><p>Hello</p><!-- c --></body></html>"
    assert extract_text(html) == "Hello"


def test_entities_and_blocks():
    html = b"<body><p>A &amp; B</p><p>x &lt; y</p><h1>T&nbsp;1</h1></body>"
    assert extract_text(html) == "A & B\nx < y\nT 1"


def test_malformed_html_is_stable():
    html = b"<html><body><h1>Title\n<p>Unclosed & paragraph\n<script>var t=1;</script>"
    out1 = extract_text(html)
    out2 = extract_text(bytearray(html))
    assert out1 == out2
    assert "Unclosed & paragraph" in out1
    assert "var t" not in out1


def test_unterminated_script_swallowed():
    assert extract_text(b"<p>keep</p><script>secret") == "keep"


def test_numeric_entities():
    assert extract_text(b"<p>&#8212; dash &#65;</p>") == "— dash A"


def test_pure_function_of_bytes(snapshot):
    table, _ = generate_pages(snapshot, 60, seed=99)
    htmls = table.column("html").to_pylist()
    first = [extract_text(h) for h in htmls]
    second = [extract_text(h) for h in htmls]
    assert first == second


def test_byte_identical_across_parallelism(ray_session, snapshot):
    """input_hint invariant: extracted text per url is byte-identical at any
    parallelism level."""
    import ray.data

    from climatemind_ontology_processing_ray.stages.extract import extract_pages_batch

    table, _ = generate_pages(snapshot, 120, seed=5)

    def run(num_blocks):
        ds = ray.data.from_arrow(table).repartition(num_blocks)
        out = ds.map_batches(
            extract_pages_batch, batch_format="pyarrow", batch_size=16
        ).take_all()
        return {r["url"]: r["extracted_text"] for r in out}

    a, b = run(1), run(8)
    assert a == b
    # and equal to the direct scalar function (structural invariant)
    expected = {
        u: extract_text(h)
        for u, h in zip(table.column("url").to_pylist(), table.column("html").to_pylist())
    }
    assert a == expected


def test_extract_arbitrary_bytes_never_crashes():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=2048))
    def prop(data):
        out = extract_text(data)
        assert isinstance(out, str)
        assert extract_text(data) == out  # deterministic

    prop()


def test_null_columns_handled(ray_session):
    import pyarrow as pa
    import ray.data

    from climatemind_ontology_processing_ray.ontology import build_fixture_snapshot
    from climatemind_ontology_processing_ray.pipelines.kg import KGConfig, run_kg_pipeline

    table = pa.table(
        {
            "url": pa.array(["u1", "u2", "u3"], pa.string()),
            "warc_ts": pa.array([0, 1, 2], pa.timestamp("us")),
            "html": pa.array([None, b"<p>increase in greenhouse effect causes global warming.</p>", b""], pa.binary()),
            "text": pa.array([None, "x", ""], pa.string()),
            "lang": pa.array([None, "en", "en"], pa.string()),
        }
    )
    snap = build_fixture_snapshot()
    pages = ray.data.from_arrow(table)
    rows = run_kg_pipeline(
        pages,
        snap,
        KGConfig(extractor_concurrency=1, linker_concurrency=1, actor_num_cpus=0.5, batch_size=8),
    ).canonical_edges.take_all()
    assert {(r["subject"], r["object"], r["predicate"]) for r in rows} == {
        ("increase in greenhouse effect", "global warming", "causes_or_promotes")
    }


def test_vectorized_path_byte_identical_fuzz():
    """The Arrow-kernel fast path must be byte-identical to the frozen
    python function for arbitrary inputs — including numeric entities
    (gated to the python path) and invalid utf-8 (batch fallback)."""
    import random

    import pyarrow as pa

    from climatemind_ontology_processing_ray.stages.extract import (
        extract_pages_batch,
        extract_text,
    )

    rng = random.Random(99)
    frags = [
        "<p>hello world</p>", "<script>var x=1;</script>", "<style>a{}</style>",
        "<div CLASS='x'>text &amp; more</div>", "<!-- comment -->", "&#8212;",
        "&#39;quoted&#39;", "plain text", "<h1>Title", "<br/>", "&copy; 2025",
        "&#100;igits", "multi  \t spaces", "\n\nnewlines\n", "<P>UPPER</P>",
        "<unknown>tag</unknown>", "& lone amp", "&#0;", "&#1114112;", "ünïcødé",
        "<table><tr><td>c</td></tr></table>", "a<b>c", "]]>", "<![CDATA[x]]>",
    ]
    htmls = []
    for _ in range(300):
        n = rng.randint(0, 12)
        htmls.append("".join(rng.choice(frags) for _ in range(n)).encode())
    htmls.append(b"\xff\xfe invalid utf8 <p>x</p>")  # forces batch fallback
    htmls.append(b"")
    batch = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(len(htmls))]),
            "html": pa.array(htmls, pa.binary()),
            "lang": pa.array(["en"] * len(htmls)),
        }
    )
    out = extract_pages_batch(batch)
    got = out.column("extracted_text").to_pylist()
    expected = [extract_text(h) for h in htmls]
    assert got == expected
    assert all(out.column("extract_ok").to_pylist())


def test_jsonl_pages_source_matches_parquet_path(ray_session, tmp_path):
    """NDJSON crawl export -> pages contract: schema coerced (string ts ->
    timestamp[us], html str -> binary, missing lang -> nulls) and the
    extract stage produces the same text as the parquet-born path."""
    import json as _json

    import pyarrow as pa

    from climatemind_ontology_processing_ray.sources.jsonl import (
        PAGES_SCHEMA,
        read_pages_jsonl,
    )
    from climatemind_ontology_processing_ray.stages.extract import (
        extract_pages_batch,
    )

    p = tmp_path / "pages.jsonl"
    rows = [
        {
            "url": f"https://ex.org/{i}",
            "warc_ts": "2024-01-02T03:04:05",
            "html": f"<html><body><p>doc {i} text</p></body></html>",
            "text": "",
        }
        for i in range(6)
    ]
    with open(p, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")

    ds = read_pages_jsonl(str(p))
    tbl = pa.Table.from_pylist(ds.take_all())
    got_schema = ds.schema()
    assert got_schema.names == PAGES_SCHEMA.names
    assert str(got_schema.types[1]) == "timestamp[us]"
    assert str(got_schema.types[2]) == "binary"
    assert tbl.column("lang").null_count == 6  # absent field -> nulls

    ext = ds.map_batches(extract_pages_batch, batch_format="pyarrow")
    out = {r["url"]: r["extracted_text"] for r in ext.take_all()}
    assert out["https://ex.org/3"] == "doc 3 text"


def test_jsonl_timestamp_variants(ray_session, tmp_path):
    """ISO-8601 variants common in crawl exports all parse: fractional
    seconds, 'Z' suffix, numeric offsets (normalized to UTC wall time) —
    the read must not raise on any of them (regression: a single-format
    strptime failed the whole read)."""
    import datetime as dt
    import json as _json

    from climatemind_ontology_processing_ray.sources.jsonl import read_pages_jsonl

    cases = [
        ("2024-01-01T00:00:00", dt.datetime(2024, 1, 1, 0, 0, 0)),
        ("2024-01-01T00:00:00.123000", dt.datetime(2024, 1, 1, 0, 0, 0, 123000)),
        ("2024-01-01T00:00:00Z", dt.datetime(2024, 1, 1, 0, 0, 0)),
        ("2024-01-01T02:00:00+02:00", dt.datetime(2024, 1, 1, 0, 0, 0)),
    ]
    p = tmp_path / "ts.jsonl"
    with open(p, "w") as f:
        for i, (ts, _) in enumerate(cases):
            f.write(
                _json.dumps(
                    {"url": f"u{i}", "warc_ts": ts, "html": "<p>x</p>", "text": ""}
                )
                + "\n"
            )
    got = {
        r["url"]: r["warc_ts"] for r in read_pages_jsonl(str(p)).take_all()
    }
    for i, (_, want) in enumerate(cases):
        ts = got[f"u{i}"]
        ts = ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts
        if ts.tzinfo is not None:
            ts = ts.astimezone(dt.timezone.utc).replace(tzinfo=None)
        assert ts == want, (i, ts, want)


def test_parse_iso_ts_mixed_single_batch():
    """All ISO variants in ONE batch: zone-bearing + naive + fractional
    together fail both whole-column Arrow casts, and Arrow strptime has no
    fractional directive — the per-value rescue must still parse every row
    (regression: fractional rows silently nulled when the batch was mixed;
    the block-per-row read path masked it)."""
    import datetime as dt

    import pyarrow as pa

    from climatemind_ontology_processing_ray.sources.jsonl import _parse_iso_ts

    col = pa.chunked_array(
        [
            pa.array(
                [
                    "2024-01-01T00:00:00",
                    "2024-01-01T00:00:00.123000",
                    "2024-01-01T00:00:00Z",
                    "2024-01-01T02:00:00+02:00",
                    None,
                ]
            )
        ]
    )
    out = _parse_iso_ts(col)
    want = [
        dt.datetime(2024, 1, 1, 0, 0, 0),
        dt.datetime(2024, 1, 1, 0, 0, 0, 123000),
        dt.datetime(2024, 1, 1, 0, 0, 0),
        dt.datetime(2024, 1, 1, 0, 0, 0),
        None,
    ]
    assert out.to_pylist() == want
