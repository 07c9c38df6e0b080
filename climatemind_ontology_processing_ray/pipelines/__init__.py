from .kg import KGConfig, run_kg_pipeline, canonical_edges_to_artifacts

__all__ = ["KGConfig", "run_kg_pipeline", "canonical_edges_to_artifacts"]
