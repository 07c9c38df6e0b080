"""CLI entry point (the reference's argparse surface, SURVEY §2.9):

    python -m climatemind_ontology_processing_ray process --pages DIR --out DIR
    python -m climatemind_ontology_processing_ray edges   --pages DIR --out CSV [--source NODE]
    python -m climatemind_ontology_processing_ray synth   --out DIR --pages N

This CLI owns its Ray session (init guarded / shutdown on exit); the
library never does.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="climatemind_ontology_processing_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("process", help="full pipeline: pages -> all outputs")
    pp.add_argument("--pages", required=True, help="pages parquet file/dir")
    pp.add_argument("--out", required=True, help="output directory")
    pp.add_argument("--checkpoint-dir", default=None)
    pp.add_argument("--num-cpus", type=int, default=8)

    pe = sub.add_parser("edges", help="canonical edge extraction only")
    pe.add_argument("--pages", required=True)
    pe.add_argument("--out", required=True, help="output csv path")
    pe.add_argument("--source", default=None, help="restrict to component reachable from this node")
    pe.add_argument("--num-cpus", type=int, default=8)

    ps = sub.add_parser("synth", help="generate the synthetic pages corpus")
    ps.add_argument("--out", required=True)
    ps.add_argument("--pages", type=int, default=10_000)
    ps.add_argument("--seed", type=int, default=13)

    args = p.parse_args(argv)

    if args.cmd == "synth":
        from .ontology.fixture import build_fixture_snapshot
        from .sources.pages import write_pages_parquet

        path = write_pages_parquet(args.out, build_fixture_snapshot(), args.pages, args.seed)
        print(path)
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        import ray.data as rd

        rd.DataContext.get_current().enable_progress_bars = False
        pages = rd.read_parquet(args.pages)
        if args.cmd == "process":
            from .pipelines.api import process_pages
            from .pipelines.kg import KGConfig

            _, paths = process_pages(
                pages, args.out, cfg=KGConfig(checkpoint_dir=args.checkpoint_dir)
            )
            for k, v in paths.items():
                print(f"{k}\t{v}")
        elif args.cmd == "edges":
            from .graph.writers import write_edges_csv
            from .pipelines.api import output_edges

            edges = output_edges(pages, source=args.source)
            rows = edges.select_columns(["subject", "object", "predicate"]).to_pandas()
            write_edges_csv(
                list(zip(rows["subject"], rows["object"], rows["predicate"])), args.out
            )
            print(f"{len(rows)} edges -> {args.out}")
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
