"""Checkpoint/resume: killed runs restart from the last completed stage
(FIXTURES.md §6 kill_matrix; north_rule resumability)."""

import os

import pytest

from climatemind_ontology_processing_ray.pipelines.kg import KGConfig, run_kg_pipeline
from climatemind_ontology_processing_ray.sources.pages import generate_pages

STAGES = ["extracted", "partials", "canonical_edges"]


def _run(table, snapshot, ckpt_dir):
    import ray.data

    cfg = KGConfig(
        extractor_concurrency=2,
        linker_concurrency=1,
        actor_num_cpus=0.5,
        batch_size=64,
        checkpoint_dir=ckpt_dir,
        run_key="test-run",
    )
    pages = ray.data.from_arrow(table).repartition(4)
    res = run_kg_pipeline(pages, snapshot, cfg)
    rows = res.canonical_edges.take_all()
    key = lambda r: (r["subject"], r["object"], r["predicate"])
    return sorted((key(r), r["support"]) for r in rows), res.checkpoints


@pytest.fixture(scope="module")
def table(snapshot):
    t, _ = generate_pages(snapshot, 200, seed=21)
    return t


def test_fresh_run_then_full_resume(ray_session, snapshot, table, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    out1, mgr1 = _run(table, snapshot, ckpt)
    assert mgr1.hits == [] and mgr1.misses == STAGES
    # manifests carry per-partition lineage
    m = mgr1.manifest("canonical_edges")
    assert m["complete"] and m["rows"] == len(out1)
    assert all("rows" in f for f in m["files"])

    out2, mgr2 = _run(table, snapshot, ckpt)
    assert mgr2.hits == STAGES and mgr2.misses == []
    assert out1 == out2  # byte-equivalent results without recompute

    # flat per-partition lineage/metrics table across all stages
    lineage = mgr2.lineage()
    assert {r["stage"] for r in lineage} == set(STAGES)
    for r in lineage:
        assert r["md5"] and r["rows"] >= 0 and r["stage_elapsed_sec"] > 0
    canon_rows = sum(r["rows"] for r in lineage if r["stage"] == "canonical_edges")
    assert canon_rows == len(out1)


def test_kill_mid_stage_recovers(ray_session, snapshot, table, tmp_path_factory):
    """A stage killed mid-write (manifest absent) is recomputed; earlier
    completed stages are not."""
    import shutil

    ckpt = str(tmp_path_factory.mktemp("ckpt2"))
    out1, _ = _run(table, snapshot, ckpt)
    # simulate kill during canonical_edges write: wipe its finalized dir
    shutil.rmtree(os.path.join(ckpt, "canonical_edges"))
    out2, mgr = _run(table, snapshot, ckpt)
    assert mgr.hits == ["extracted", "partials"]
    assert mgr.misses == ["canonical_edges"]
    assert out1 == out2


def test_stale_run_key_recomputes(ray_session, snapshot, table, tmp_path_factory):
    import ray.data

    ckpt = str(tmp_path_factory.mktemp("ckpt3"))
    _run(table, snapshot, ckpt)
    cfg = KGConfig(
        extractor_concurrency=2,
        linker_concurrency=1,
        actor_num_cpus=0.5,
        batch_size=64,
        checkpoint_dir=ckpt,
        run_key="DIFFERENT",
    )
    pages = ray.data.from_arrow(table).repartition(4)
    res = run_kg_pipeline(pages, snapshot, cfg)
    res.canonical_edges.take_all()
    assert res.checkpoints.hits == []


def test_task_failure_retried(ray_session, snapshot, table, tmp_path_factory):
    """Fault tolerance: a UDF that crashes once per worker process is
    retried (retry_exceptions) and the pipeline completes with correct,
    complete output."""
    import os

    import pyarrow as pa
    import ray
    import ray.data

    marker_dir = str(tmp_path_factory.mktemp("crash_markers"))

    def flaky_identity(batch: pa.Table) -> pa.Table:
        marker = os.path.join(marker_dir, f"pid-{os.getpid()}")
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("crashed once")
            raise RuntimeError("injected one-shot failure")
        return batch

    ds = ray.data.from_arrow(table).repartition(4)
    out = ds.map_batches(
        flaky_identity,
        batch_format="pyarrow",
        retry_exceptions=True,
        max_retries=3,
    ).take_all()
    assert len(out) == table.num_rows


def test_changed_ontology_invalidates_checkpoints(
    ray_session, snapshot, table, tmp_path_factory
):
    """Same run_key but a different ontology snapshot must NOT resume from
    the old checkpoints (input fingerprint folded into the manifest key)."""
    import copy

    import ray.data

    from climatemind_ontology_processing_ray.ontology.fixture import (
        build_fixture_snapshot,
    )

    ckpt = str(tmp_path_factory.mktemp("ckpt4"))
    _run(table, snapshot, ckpt)
    other = build_fixture_snapshot(extra_chain_nodes=5)  # different ontology
    cfg = KGConfig(
        extractor_concurrency=2,
        linker_concurrency=1,
        actor_num_cpus=0.5,
        batch_size=64,
        checkpoint_dir=ckpt,
        run_key="test-run",
    )
    pages = ray.data.from_arrow(table).repartition(4)
    res = run_kg_pipeline(pages, other, cfg)
    res.canonical_edges.take_all()
    assert res.checkpoints.hits == []
