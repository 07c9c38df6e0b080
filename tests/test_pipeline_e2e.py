"""End-to-end KG pipeline: P/R gate, determinism across parallelism,
canonicalization counts, adjacency schema (SURVEY §5.2 items 3-4)."""

import pyarrow as pa
import pytest

from climatemind_ontology_processing_ray.ontology.oracle import precision_recall
from climatemind_ontology_processing_ray.pipelines.kg import (
    KGConfig,
    canonical_edges_to_artifacts,
    run_kg_pipeline,
)
from climatemind_ontology_processing_ray.sources.pages import generate_pages


@pytest.fixture(scope="module")
def pages_and_info(snapshot):
    return generate_pages(snapshot, 300, seed=13)


def _run(table, snapshot, num_blocks=4, **cfg_kwargs):
    import ray.data

    cfg = KGConfig(
        extractor_concurrency=2, linker_concurrency=1, actor_num_cpus=0.5, batch_size=64, **cfg_kwargs
    )
    pages = ray.data.from_arrow(table).repartition(num_blocks)
    res = run_kg_pipeline(pages, snapshot, cfg)
    rows = res.canonical_edges.take_all()
    return rows, res


def test_precision_recall_gate(ray_session, snapshot, golden, pages_and_info):
    """The BASELINE.md correctness gate: P/R >= 0.95 vs the reference
    (oracle) edge set."""
    table, info = pages_and_info
    rows, _ = _run(table, snapshot)
    emitted = {(r["subject"], r["object"], r["predicate"]) for r in rows}
    p, r = precision_recall(emitted, golden)
    assert p >= 0.95, f"precision {p}"
    assert r >= 0.95, f"recall {r}"
    # false positives are exactly the labeled traps (within budget)
    assert (emitted - golden) <= info.trap_triples
    # why the trap FP is NOT filtered (NOTES round-3 analysis): the trap
    # has support=1, but so does a large fraction of GOLDEN edges (Zipf
    # support) — a support>=2 threshold would reject the trap at a
    # catastrophic recall cost, and no extraction-time signal separates
    # a false assertion from a true one.  Pin the premise so a fixture
    # change that invalidates the analysis fails loudly.
    support = {(r_["subject"], r_["object"], r_["predicate"]): r_["support"] for r_ in rows}
    golden_s1 = sum(1 for k, v in support.items() if k in golden and v == 1)
    assert golden_s1 >= 0.3 * len(golden & emitted), (
        "support>=2 became a viable trap filter — revisit NOTES analysis"
    )


def test_identical_edge_set_across_parallelism(ray_session, snapshot, pages_and_info):
    table, _ = pages_and_info
    rows_a, _ = _run(table, snapshot, num_blocks=2)
    rows_b, _ = _run(table, snapshot, num_blocks=8)
    key = lambda r: (r["subject"], r["object"], r["predicate"])
    a = sorted(((key(r), r["support"], tuple(r["sources"])) for r in rows_a))
    b = sorted(((key(r), r["support"], tuple(r["sources"])) for r in rows_b))
    assert a == b


def test_non_english_pages_contribute_nothing(ray_session, snapshot, pages_and_info):
    import ray.data

    table, _ = pages_and_info
    non_en = table.filter(pa.compute.not_equal(table.column("lang"), pa.scalar("en")))
    assert non_en.num_rows > 0
    rows, _ = _run(non_en, snapshot, num_blocks=2)
    assert rows == []


def test_support_counts_sources(ray_session, snapshot, pages_and_info):
    table, _ = pages_and_info
    rows, _ = _run(table, snapshot)
    for r in rows:
        assert r["support"] >= 1
        assert 1 <= len(r["sources"]) <= 8
        for u in r["sources"]:
            assert u.startswith("https://site-")


def test_mention_canonicalization_counts(ray_session, snapshot, pages_and_info):
    """Salted two-phase mention counts == naive single-process counts."""
    import ray.data

    from climatemind_ontology_processing_ray.stages import (
        MentionDetector,
        canonicalize_mentions,
        extract_pages_batch,
    )
    import ray

    table, _ = pages_and_info
    snapshot_ref = ray.put(snapshot.to_json())
    extracted = (
        ray.data.from_arrow(table)
        .repartition(4)
        .map_batches(extract_pages_batch, batch_format="pyarrow")
    )
    mentions = extracted.map_batches(
        MentionDetector,
        fn_constructor_kwargs={"snapshot_ref": snapshot_ref},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
    )
    mention_rows = mentions.take_all()
    naive: dict[str, int] = {}
    for r in mention_rows:
        naive[r["surface_norm"]] = naive.get(r["surface_norm"], 0) + 1

    counted = canonicalize_mentions(
        mentions, num_salts=8, surface_index=snapshot.surface_index()
    ).take_all()
    got = {r["surface_norm"]: r["n_mentions"] for r in counted}
    assert got == naive
    # head-entity skew present (north_star): climate change is a head surface
    assert naive.get("climate change", 0) + naive.get("global warming", 0) > 50
    # labels attached via broadcast index
    by_norm = {r["surface_norm"]: r["node_label"] for r in counted}
    assert by_norm.get("climate change") == "global warming"


def test_adjacency_materialize(ray_session, snapshot, pages_and_info):
    from climatemind_ontology_processing_ray.stages import build_adjacency

    table, _ = pages_and_info
    _, res = _run(table, snapshot)
    adj = build_adjacency(res.canonical_edges).take_all()
    subjects = [r["subject"] for r in adj]
    assert len(subjects) == len(set(subjects))
    row = next(r for r in adj if r["subject"] == "global warming")
    objs = [e["object"] for e in row["edges"]]
    assert objs == sorted(objs)
    assert row["degree"] == len(objs)
    assert all(e["support"] >= 1 for e in row["edges"])


def test_driver_side_artifacts_from_pipeline_edges(
    ray_session, snapshot, golden, pages_and_info
):
    """Full lifecycle: distributed front end -> driver-side enrichment."""
    table, _ = pages_and_info
    _, res = _run(table, snapshot)
    art = canonical_edges_to_artifacts(res.canonical_edges, snapshot)
    root = art.G.nodes["increase in greenhouse effect"]
    assert root["mitigation solutions"]
    assert "downstream_adaptations" in art.subgraphs


def test_salting_spreads_hot_keys(ray_session):
    """White-box skew check: a hot surface form's partial rows land in
    multiple salted groups before the final merge (SURVEY §7.3)."""
    import pandas as pd
    import ray.data

    from climatemind_ontology_processing_ray.stages.canonicalize import _salt_of

    # 10k mentions of one head key from 200 distinct urls
    rows = [
        {"url": f"https://site-{i % 200}.example/p{i}", "surface_norm": "climate change"}
        for i in range(10_000)
    ]
    salts = {_salt_of(r["url"], 16) for r in rows}
    assert len(salts) > 8  # the hot key spreads over most of the 16 salts

    from climatemind_ontology_processing_ray.stages.canonicalize import (
        canonicalize_mentions,
    )

    ds = ray.data.from_items(rows).repartition(8)
    out = canonicalize_mentions(ds, num_salts=16).take_all()
    assert out == [{"surface_norm": "climate change", "n_mentions": 10_000}]


def test_mention_spans_are_exact_page_offsets(ray_session, snapshot):
    import ray
    import ray.data

    from climatemind_ontology_processing_ray.stages import MentionDetector

    text = "Sea level rise worries experts.\nGlobal warming causes sea level rise."
    ds = ray.data.from_items([{"url": "u", "extracted_text": text}])
    snapshot_ref = ray.put(snapshot.to_json())
    rows = ds.map_batches(
        MentionDetector,
        fn_constructor_kwargs={"snapshot_ref": snapshot_ref},
        batch_format="pyarrow",
        concurrency=1,
    ).take_all()
    for r in rows:
        assert text.lower()[r["span_start"] : r["span_end"]] == r["surface"]
    assert {r["surface"] for r in rows} == {"sea level rise", "global warming"}
    sids = {r["span_start"]: r["sent_id"] for r in rows}
    assert sids[0] == 0  # first sentence
    assert max(sids.values()) >= 1  # later mentions in a later sentence


def test_skew_stress_partial_rows_bounded(ray_session, snapshot):
    """Zipf-heavy stress (SURVEY §7.1 item 5): a single hot triple repeated
    on most pages must enter the shuffle as at most (blocks x salts) partial
    rows, not one row per occurrence — the map-side combine bound."""
    import pyarrow as pa
    import ray
    import ray.data

    from climatemind_ontology_processing_ray.stages.extract import extract_pages_batch
    from climatemind_ontology_processing_ray.stages.fused import make_fused_partials_fn

    n_pages, n_blocks, n_salts = 600, 6, 8
    hot = "global warming causes sea level rise."
    table = pa.table(
        {
            "url": pa.array([f"https://s{i % 97}.example/{i}" for i in range(n_pages)]),
            "html": pa.array(
                [f"<p>{hot} Filler {i}.</p>".encode() for i in range(n_pages)],
                pa.binary(),
            ),
            "lang": pa.array(["en"] * n_pages),
        }
    )
    ref = ray.put(snapshot.to_json())
    partials = (
        ray.data.from_arrow(table)
        .repartition(n_blocks)
        .map_batches(extract_pages_batch, batch_format="pyarrow")
        .map_batches(
            make_fused_partials_fn(snapshot_ref=ref, num_salts=n_salts),
            batch_format="pyarrow",
            batch_size=None,
        )
        .take_all()
    )
    hot_rows = [p for p in partials if p["subject"] == "global warming"]
    assert sum(p["support"] for p in hot_rows) == n_pages  # nothing lost
    assert len(hot_rows) <= n_blocks  # one partial row per block, not per page
    # and the salts spread those partials across reducers
    assert len({p["salt"] for p in hot_rows}) > 1


def test_extract_link_fn_matches_actor_pool(ray_session, snapshot):
    """make_extract_link_fn (the task-based extract+link used by the
    provenance join in kg_edge_timespan) must emit exactly the rows the
    separate TripleExtractor/EntityLinker actor pools emit."""
    import pandas as pd
    import ray
    import ray.data

    from climatemind_ontology_processing_ray import stages as S
    from climatemind_ontology_processing_ray.ontology.fixture import (
        build_fixture_snapshot,
    )
    from climatemind_ontology_processing_ray.sources.pages import generate_pages
    from climatemind_ontology_processing_ray.stages.fused import make_extract_link_fn

    snap = build_fixture_snapshot()
    table, _ = generate_pages(snap, 64, seed=13)
    sj = snap.to_json()
    cols = ["subj_label", "obj_label", "predicate", "url"]

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        return df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)

    base = (
        ray.data.from_arrow(table)
        .repartition(4)
        .map_batches(S.extract_pages_batch, batch_format="pyarrow")
    )
    pooled = base.map_batches(
        S.TripleExtractor,
        fn_constructor_kwargs={"snapshot_json": sj},
        batch_format="pyarrow",
        concurrency=(1, 2),
    ).map_batches(
        S.EntityLinker,
        fn_constructor_kwargs={"snapshot_json": sj, "threshold": 0.85},
        batch_format="pyarrow",
        concurrency=(1, 2),
    )
    fused = base.map_batches(
        make_extract_link_fn(snapshot_json=sj, threshold=0.85),
        batch_format="pyarrow",
    )
    pd.testing.assert_frame_equal(
        norm(pooled.select_columns(cols).to_pandas()),
        norm(fused.select_columns(cols).to_pandas()),
    )
