"""Causal-pattern triple extraction (SURVEY §2.2 "new-engine-only" stage c).

A stateful stage sharing the mention automaton: adjacent mention pairs in
the same sentence whose connecting text matches a causal connective emit
one pre-link triple row (implemented as a single whole-page scan — a
sentence boundary inside the gap disqualifies the pair, equivalent to
per-sentence pairing).  The connective table mirrors the
reference's two dominant predicates (``causes_or_promotes`` and
``is_inhibited_or_prevented_or_blocked_or_slowed_by``,
``make_graph_class.py:423``, ``:460``) plus the remaining reference edge
types (myth/exposure/population/is_a, SURVEY §1.2 edge-type table).

Inhibition connectives read solution-first ("X can prevent Y"), so the
emitted triple is (subject=Y, object=X, INHIBITS) — the reference's
problem->solution edge direction (``make_graph_class.py:459-461``).
"""

from __future__ import annotations

import pyarrow as pa

from ..ontology.vocab import CAUSES, EXPOSURE, INHIBITS, IS_A, MYTH_ABOUT, POPULATION
from .mentions import _load_snapshot, build_surface_pattern

# connective text (lowercased, stripped) -> (predicate, subject_first)
CONNECTIVES: dict[str, tuple[str, bool]] = {
    "causes": (CAUSES, True),
    "leads to": (CAUSES, True),
    "contributes to": (CAUSES, True),
    "promotes": (CAUSES, True),
    "can prevent": (INHIBITS, False),
    "inhibits": (INHIBITS, False),
    "slows": (INHIBITS, False),
    "reduces": (INHIBITS, False),
    "is a myth about": (MYTH_ABOUT, True),
    "has exposure dependency of": (EXPOSURE, True),
    "affects the population of": (POPULATION, True),
    "is a kind of": (IS_A, True),
}

_GAP_STRIP = " \t,;:"


class TripleExtractor:
    """pages(extracted_text) -> pre-link triple rows.

    Output schema: url, sent_id, subj_surface, obj_surface, predicate,
    evidence (the matched sentence).
    """

    def __init__(self, snapshot_ref=None, snapshot_json: str | None = None):
        snap = _load_snapshot(snapshot_ref, snapshot_json)
        forms: set[str] = set()
        for node in snap.individuals.values():
            forms.update(node.get("surface_forms") or [node["label"]])
        self.pattern = build_surface_pattern(forms)

    # connectives are short; gaps longer than this can't match
    _MAX_GAP = max(len(c) for c in CONNECTIVES) + 8

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("extracted_text").to_pylist()
        o_url, o_sid, o_subj, o_obj, o_pred, o_evidence = [], [], [], [], [], []
        max_gap = self._MAX_GAP
        for url, text in zip(urls, texts):
            low = (text or "").lower()
            # single whole-page scan; a sentence boundary ('.', '!', '?',
            # newline) inside the gap disqualifies the pair, which is
            # exactly the per-sentence pairing without the per-sentence
            # regex loop (hot-path optimization; semantics unchanged)
            mentions = self.pattern.finditer(low)
            prev = next(mentions, None)
            for m2 in mentions:
                m1, prev = prev, m2
                gap = low[m1.end() : m2.start()]
                if len(gap) > max_gap or any(c in gap for c in ".!?\n"):
                    continue
                hit = CONNECTIVES.get(gap.strip(_GAP_STRIP))
                if hit is None:
                    continue
                predicate, subject_first = hit
                a, b = m1.group(0), m2.group(0)
                subj, obj = (a, b) if subject_first else (b, a)
                # sentence id + evidence derived lazily, only on a hit
                sid = low.count(".", 0, m1.start()) + low.count("\n", 0, m1.start())
                start = max(
                    low.rfind(".", 0, m1.start()), low.rfind("\n", 0, m1.start())
                ) + 1
                end = m2.end()
                o_url.append(url)
                o_sid.append(sid)
                o_subj.append(subj)
                o_obj.append(obj)
                o_pred.append(predicate)
                o_evidence.append(text[start : end + 1].strip()[:300])
        return pa.table(
            {
                "url": pa.array(o_url, pa.string()),
                "sent_id": pa.array(o_sid, pa.int32()),
                "subj_surface": pa.array(o_subj, pa.string()),
                "obj_surface": pa.array(o_obj, pa.string()),
                "predicate": pa.array(o_pred, pa.string()),
                "evidence": pa.array(o_evidence, pa.string()),
            }
        )
