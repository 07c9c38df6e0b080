"""Mention detection: stateful actor-pool stage (SURVEY §2.3 A1).

The reference resolves labels with a linear ``onto.search_one(label=...)``
scan per node (``make_graph_class.py:114``).  Here the ontology's surface
forms are compiled ONCE PER ACTOR into a single longest-first regex
alternation (C-speed scan, equivalent to an Aho-Corasick automaton for
this vocabulary size) in ``__init__``; ``__call__`` then scans each batch.

Use as::

    snap_ref = ray.put(snap.to_json())
    pages.map_batches(
        MentionDetector,
        fn_constructor_kwargs={"snapshot_ref": snap_ref},
        batch_format="pyarrow", batch_size=512,
        concurrency=(2, 8), num_cpus=1,
    )

The broadcast happens once per actor (``ray.get`` in ``__init__``), never
per batch.
"""

from __future__ import annotations

import re
from typing import Iterable

import pyarrow as pa

from ..ontology.schema import OntologySnapshot, normalize_surface

SENTENCE_SPLIT = re.compile(r"(?<=[.!?])\s+|\n+")


def build_surface_pattern(surface_forms: Iterable[str]) -> re.Pattern:
    """Longest-first, word-boundary alternation over lowercased variants."""
    variants = sorted({v.lower() for v in surface_forms if v}, key=len, reverse=True)
    if not variants:
        return re.compile(r"(?!x)x")  # matches nothing
    alts = "|".join(re.escape(v) for v in variants)
    return re.compile(rf"(?<![a-z0-9])(?:{alts})(?![a-z0-9])")


def _load_snapshot(snapshot_ref=None, snapshot_json: str | None = None) -> OntologySnapshot:
    if snapshot_ref is not None:
        import ray

        snapshot_json = ray.get(snapshot_ref)
    assert snapshot_json is not None, "need snapshot_ref or snapshot_json"
    return OntologySnapshot.from_json(snapshot_json)


class MentionDetector:
    """pages(extracted_text) -> mention rows.

    Output schema: url, sent_id (int32), surface, surface_norm,
    node_label (nullable), span_start, span_end (int32).
    """

    def __init__(self, snapshot_ref=None, snapshot_json: str | None = None):
        snap = _load_snapshot(snapshot_ref, snapshot_json)
        forms: set[str] = set()
        for node in snap.individuals.values():
            forms.update(node.get("surface_forms") or [node["label"]])
        self.pattern = build_surface_pattern(forms)
        self.index = snap.surface_index()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("extracted_text").to_pylist()
        out_url, out_sid, out_surface, out_norm, out_label = [], [], [], [], []
        out_start, out_end = [], []
        for url, text in zip(urls, texts):
            # single whole-page scan: spans are exact page offsets; sent_id
            # counts sentence terminators before the match
            low = (text or "").lower()
            for m in self.pattern.finditer(low):
                norm = normalize_surface(m.group(0))
                s = m.start()
                sid = (
                    low.count(".", 0, s)
                    + low.count("!", 0, s)
                    + low.count("?", 0, s)
                    + low.count("\n", 0, s)
                )
                out_url.append(url)
                out_sid.append(sid)
                out_surface.append(m.group(0))
                out_norm.append(norm)
                out_label.append(self.index.get(norm))
                out_start.append(s)
                out_end.append(m.end())
        return pa.table(
            {
                "url": pa.array(out_url, pa.string()),
                "sent_id": pa.array(out_sid, pa.int32()),
                "surface": pa.array(out_surface, pa.string()),
                "surface_norm": pa.array(out_norm, pa.string()),
                "node_label": pa.array(out_label, pa.string()),
                "span_start": pa.array(out_start, pa.int32()),
                "span_end": pa.array(out_end, pa.int32()),
            }
        )
