"""Entity linking: actor-pool stage scoring surface forms against
canonical ontology IRIs (SURVEY §2.3 A2; north_star "actor-pool stages
score entity links to canonical ontology IRIs").

The reference links by exact label equality (``onto.search_one``,
``make_graph_class.py:114``); here linking is: normalize the surface
(same rule as the canonicalization shuffle key), exact-match against the
broadcast surface index (score 1.0), fall back to a de-pluralized match
(score 0.9), otherwise abstain.  Rows where either endpoint abstains or
scores below the threshold are dropped (precision guard: unknown-entity
causal sentences must not become triples).
"""

from __future__ import annotations

import pyarrow as pa

from ..ontology.schema import OntologySnapshot, normalize_surface
from .mentions import _load_snapshot


class EntityLinker:
    """pre-link triples -> linked triples.

    Adds subj_label, obj_label, subj_iri, obj_iri, subj_score, obj_score
    and filters to rows where both endpoints link at >= threshold.
    """

    def __init__(
        self,
        snapshot_ref=None,
        snapshot_json: str | None = None,
        threshold: float = 0.85,
    ):
        snap: OntologySnapshot = _load_snapshot(snapshot_ref, snapshot_json)
        self.index = snap.surface_index()
        self.iris = {label: node["iri"] for label, node in snap.individuals.items()}
        self.threshold = threshold

    def _link(self, surface: str) -> tuple[str | None, float]:
        norm = normalize_surface(surface)
        label = self.index.get(norm)
        if label is not None:
            return label, 1.0
        if norm.endswith("s"):
            label = self.index.get(norm[:-1])
            if label is not None:
                return label, 0.9
        return None, 0.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        subj_surfaces = batch.column("subj_surface").to_pylist()
        obj_surfaces = batch.column("obj_surface").to_pylist()
        # memoized per-batch lookups (surfaces repeat heavily under Zipf skew)
        cache: dict[str, tuple[str | None, float]] = {}
        keep_idx, s_label, o_label, s_iri, o_iri, s_score, o_score = (
            [], [], [], [], [], [], [],
        )
        for i, (ss, os_) in enumerate(zip(subj_surfaces, obj_surfaces)):
            ls = cache.get(ss)
            if ls is None:
                ls = self._link(ss)
                cache[ss] = ls
            lo = cache.get(os_)
            if lo is None:
                lo = self._link(os_)
                cache[os_] = lo
            if (
                ls[0] is not None
                and lo[0] is not None
                and ls[1] >= self.threshold
                and lo[1] >= self.threshold
            ):
                keep_idx.append(i)
                s_label.append(ls[0])
                o_label.append(lo[0])
                s_iri.append(self.iris[ls[0]])
                o_iri.append(self.iris[lo[0]])
                s_score.append(ls[1])
                o_score.append(lo[1])
        out = batch.take(pa.array(keep_idx, pa.int64()))
        out = out.append_column("subj_label", pa.array(s_label, pa.string()))
        out = out.append_column("obj_label", pa.array(o_label, pa.string()))
        out = out.append_column("subj_iri", pa.array(s_iri, pa.string()))
        out = out.append_column("obj_iri", pa.array(o_iri, pa.string()))
        out = out.append_column("subj_score", pa.array(s_score, pa.float32()))
        out = out.append_column("obj_score", pa.array(o_score, pa.float32()))
        return out
