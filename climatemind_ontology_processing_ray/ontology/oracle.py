"""Single-process oracle: the reference's edge-triple semantics.

The reference extracts edge triples with a stack-driven DFS over the
owlready2 world (``network_class.py:121-156``): every individual is used
as a DFS root, each popped ``(parent, children, edge_type)`` record emits
``(parent.label, child.label, edge_type)`` triples
(``network_class.py:57``), and ``dfs_for_classes``
(``network_class.py:84-119``) walks the parent-class hierarchy of each
individual, emitting an edge from the *individual* to any individual
found among a class's object-property values (typed by that property) or
among a class's parents (typed ``is_a``, ``network_class.py:109-110``).
The triple list is then exactly deduplicated (``make_network.py:44``).

Because every individual is a root, the emitted *set* is independent of
DFS order: it is exactly

  { (i, v, alias(p))  : individual i asserts p(i, v), v an individual }
∪ { (i, v, alias(p))  : some ancestor class c of i asserts p(c, v) }
∪ { (i, v, "is_a")    : some ancestor class c of i has individual parent v }

which is what this oracle computes directly.  ``alias`` is the
``give_alias`` normalization (``ontology_processing_utils.py:168-174``),
reimplemented as :func:`normalize_predicate_label`.
"""

from __future__ import annotations

from .schema import OntologySnapshot
from .vocab import IS_A, normalize_predicate_label

Triple = tuple[str, str, str]  # (subject, object, predicate) — make_network.py:42 column order


def golden_edge_set(snap: OntologySnapshot) -> set[Triple]:
    """The reference pipeline's deduplicated edge-triple set."""
    edges: set[Triple] = set()

    for s, raw_pred, o in snap.obj_edges:
        if s in snap.individuals and o in snap.individuals:
            edges.add((s, o, normalize_predicate_label(raw_pred)))

    # class-derived edges: precompute which individuals see which classes
    class_prop_edges: dict[str, list[tuple[str, str]]] = {}
    for c, raw_pred, v in snap.class_obj_edges:
        if v in snap.individuals:
            class_prop_edges.setdefault(c, []).append((normalize_predicate_label(raw_pred), v))
    class_isa: dict[str, list[str]] = {}
    for c, v in snap.class_individual_parents:
        if v in snap.individuals:
            class_isa.setdefault(c, []).append(v)

    if class_prop_edges or class_isa:
        for label, node in snap.individuals.items():
            ancestors: set[str] = set()
            for c in node["direct_classes"]:
                ancestors |= snap.class_ancestors(c)
            for c in ancestors:
                for pred, v in class_prop_edges.get(c, ()):
                    edges.add((label, v, pred))
                for v in class_isa.get(c, ()):
                    edges.add((label, v, IS_A))
    return edges


def precision_recall(
    emitted: set[Triple], golden: set[Triple]
) -> tuple[float, float]:
    """P/R of an emitted triple set vs the golden set (BASELINE.md gate)."""
    if not emitted:
        return (1.0 if not golden else 0.0, 0.0 if golden else 1.0)
    tp = len(emitted & golden)
    return tp / len(emitted), tp / len(golden) if golden else 1.0
