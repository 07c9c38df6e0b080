"""Benchmark harness.

Default: runs the headline KG-construction pipeline plus representative
operator pipelines over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1)
and prints ONE JSON line::

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "pages_per_sec": ..., "triples_per_sec": ...}

``--scaling``: runs the headline pipeline twice in fresh processes
(num_cpus=8 then num_cpus=32) on the same cached input and reports both
throughputs plus scaling efficiency (BASELINE.md protocol).

This script OWNS its Ray session (init/shutdown); library code never does.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
PAGES_PER_DOC = 20  # synthetic corpus scale: pages = 20x documents rows


def _pages_dir(n_pages: int, seed: int = 13) -> str:
    key = hashlib.sha1(f"kgpages:{n_pages}:{seed}".encode()).hexdigest()[:12]
    return os.path.join("/tmp", f"kg_pages_{key}")


def prepare_pages(n_pages: int) -> str:
    """Generate (once) and cache the deterministic synthetic pages corpus."""
    from climatemind_ontology_processing_ray.ontology import build_fixture_snapshot
    from climatemind_ontology_processing_ray.sources.pages import write_pages_parquet

    snap = build_fixture_snapshot()
    return write_pages_parquet(_pages_dir(n_pages), snap, n_pages, seed=13)


def run_bench() -> dict:
    import pyarrow.parquet as pq

    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False

    from climatemind_ontology_processing_ray.ontology import build_fixture_snapshot
    from climatemind_ontology_processing_ray.pipelines.kg import KGConfig, run_kg_pipeline
    from climatemind_ontology_processing_ray.pipelines import queries as Q

    n_docs = pq.read_metadata(os.path.join(SF_DIR, "documents.parquet")).num_rows
    n_pages = n_docs * PAGES_PER_DOC
    pages_path = prepare_pages(n_pages)

    # warm the OS page cache so we measure compute + shuffle, not cold disk
    rd.read_parquet(pages_path).count()

    snap = build_fixture_snapshot()
    timings: dict[str, float] = {}

    # ---- headline: KG construction pipeline -------------------------- #
    # block count fixed (not CPU-derived) so both scaling runs see the same
    # plan; 96 blocks ≈ 1k rows/block at sf0.1
    t0 = time.perf_counter()
    pages = rd.read_parquet(pages_path, override_num_blocks=96)
    res = run_kg_pipeline(
        pages,
        snap,
        KGConfig(
            batch_size=1024,
            extractor_concurrency=(4, max(4, NUM_CPUS - 8)),
            linker_concurrency=(2, max(2, NUM_CPUS // 4)),
        ),
    )
    n_edges = 0
    n_triples = 0
    for row in res.canonical_edges.take_all():
        n_edges += 1
        n_triples += row["support"]
    kg_sec = time.perf_counter() - t0
    timings["kg_pipeline"] = round(kg_sec, 3)

    # ---- representative operator pipelines --------------------------- #
    bench_queries = [
        "pricing_summary",
        "region_rollup",
        "orders_join_agg",
        "events_hourly",
        "sessionize",
        "dedup_exact",
        "minhash_lsh",
        "simhash",
        "embedding_neardup",
        "ann_topk",
        "token_counts",
        "quality_scores",
    ]
    reg = Q.REGISTRY
    for name in bench_queries:
        fn, _ = reg[name]
        t0 = time.perf_counter()
        out = fn(SF_DIR)
        # consume lazily-returned results
        if hasattr(out, "to_pandas"):
            out.to_pandas()
        timings[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    return {
        "metric": "kg_pipeline_wall_sec_sf",
        "value": timings["kg_pipeline"],
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_pages": n_pages,
        "n_canonical_edges": n_edges,
        "n_supporting_triples": n_triples,
        "pages_per_sec": round(n_pages / kg_sec, 1),
        "triples_per_sec": round(n_triples / kg_sec, 1),
    }


def run_scaling() -> dict:
    """Two parallelism levels in fresh processes on the same cached input
    (the sandbox proxy for N vs 4N cluster nodes, BASELINE.md protocol)."""
    results = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        results[ncpu] = json.loads(out.strip().splitlines()[-1])
    t8 = results[8]["value"]
    t32 = results[32]["value"]
    eff = (t8 / t32) / (32 / 8)
    return {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": t8,
        "sec_32": t32,
        "pages_per_sec_8": results[8]["pages_per_sec"],
        "pages_per_sec_32": results[32]["pages_per_sec"],
        "triples_per_sec_8": results[8]["triples_per_sec"],
        "triples_per_sec_32": results[32]["triples_per_sec"],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
