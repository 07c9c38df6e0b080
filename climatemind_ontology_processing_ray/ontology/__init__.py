from .vocab import (
    CAUSES,
    INHIBITS,
    IS_A,
    MYTH_ABOUT,
    PERSONAL_VALUES_19,
    SOURCE_TYPES,
    normalize_predicate_label,
)
from .schema import OntologySnapshot
from .fixture import build_fixture_snapshot
from .oracle import golden_edge_set

__all__ = [
    "CAUSES",
    "INHIBITS",
    "IS_A",
    "MYTH_ABOUT",
    "PERSONAL_VALUES_19",
    "SOURCE_TYPES",
    "normalize_predicate_label",
    "OntologySnapshot",
    "build_fixture_snapshot",
    "golden_edge_set",
]
