from .extract import extract_text, extract_pages_batch
from .mentions import MentionDetector, build_surface_pattern
from .triples import TripleExtractor, CONNECTIVES
from .link import EntityLinker
from .canonicalize import canonicalize_triples, canonicalize_mentions
from .adjacency import build_adjacency

__all__ = [
    "extract_text",
    "extract_pages_batch",
    "MentionDetector",
    "build_surface_pattern",
    "TripleExtractor",
    "CONNECTIVES",
    "EntityLinker",
    "canonicalize_triples",
    "canonicalize_mentions",
    "build_adjacency",
]
