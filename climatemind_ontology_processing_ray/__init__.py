"""climatemind_ontology_processing_ray — a Ray-Data-native knowledge-graph
construction engine.

A from-scratch re-expression of the capabilities of
ClimateMind/climatemind-ontology-processing (reference at /root/reference,
cited by file:line throughout) as an idiomatic Ray Data pipeline:

    pages (url, warc_ts, html, text, lang) Parquet
      -> map_batches(extract_html)        [stateless, zero-copy Arrow]
      -> lang/quality filter              [vectorized predicate]
      -> map_batches(MentionDetector)     [actor pool; automaton in __init__]
      -> map_batches(extract_triples)     [stateless, causal patterns]
      -> map_batches(EntityLinker)        [actor pool; broadcast ontology index]
      -> salted groupby canonicalization  [two-phase shuffle, head-key salting]
      -> groupby (subject,object,predicate) dedup + support/source aggregation
      -> sorted groupby(subject) adjacency partitions  [Parquet sink]
      -> driver-side graph enrichment on the (small) canonical edge table,
         mirroring the reference's make_graph/process_* semantics.

Nothing here calls ray.init()/ray.shutdown(); sessions are owned by the
caller (bench.py, CLI, test fixture, or the evaluation driver).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level convenience exports (keeps bare import light)
    if name in ("process_pages", "output_edges", "extract_mentions"):
        from .pipelines import api

        return getattr(api, name)
    if name in ("KGConfig", "run_kg_pipeline", "canonical_edges_to_artifacts"):
        from .pipelines import kg

        return getattr(kg, name)
    raise AttributeError(name)
