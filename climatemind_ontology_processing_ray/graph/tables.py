"""Enriched graph as Arrow-native tables (SURVEY §1.3 "ontology nodes" /
edge schema).

The reference materializes only Python objects (DiGraph + pickle); here
the enriched graph is also exposed as Ray Datasets with real nested
types — ``properties`` as ``map<string, list<string>>``, the fixed-key
``data_properties`` as a struct, value vectors as ``list<int8>`` — so
downstream consumers can keep working in the data plane (join against
canonical edges, write partitioned Parquet, etc.).  Dynamic node keys
(superclass-named keys, conditional ``mitigation solutions`` lists, …)
cannot live in a fixed Arrow schema; they are carried as a JSON ``extra``
column and re-expanded only at driver-side graph materialization
(SURVEY §7.4 "dynamic node-attribute keys").
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data as rd

from ..ontology.vocab import EXTRA_DATA_PROPS, PERSONAL_VALUES_19
from .enrich import GraphArtifacts

_BASE_KEYS = {
    "label",
    "iri",
    "comment",
    "direct classes",
    "all classes",
    "properties",
    "data_properties",
    "personal_values_10",
    "personal_values_19",
    "political_value",
}


def _data_properties_type() -> pa.DataType:
    fields = [pa.field(k, pa.int8()) for k in PERSONAL_VALUES_19]
    fields += [
        pa.field("conservative", pa.int8()),
        pa.field("liberal", pa.int8()),
        pa.field("CO2_eq_reduced", pa.float64()),
        pa.field("myth_frequency", pa.float64()),
        pa.field("myth", pa.bool_()),
    ]
    return pa.struct(fields)


def nodes_table(art: GraphArtifacts) -> pa.Table:
    labels, iris, comments, direct, allc = [], [], [], [], []
    props, dps, pv10, pv19, political, extra = [], [], [], [], [], []
    dp_type = _data_properties_type()
    dp_keys = [f.name for f in dp_type]
    for node, a in sorted(art.G.nodes(data=True)):
        labels.append(a.get("label", node))
        iris.append(a.get("iri"))
        comments.append(a.get("comment", ""))
        direct.append(list(a.get("direct classes", [])))
        allc.append(list(a.get("all classes", [])))
        props.append(list((a.get("properties") or {}).items()))
        dp = a.get("data_properties") or {}
        dps.append({k: dp.get(k) for k in dp_keys})
        pv10.append(a.get("personal_values_10"))
        pv19.append(a.get("personal_values_19"))
        political.append(a.get("political_value"))
        extra.append(
            json.dumps(
                {k: v for k, v in a.items() if k not in _BASE_KEYS},
                sort_keys=True,
                default=str,
            )
        )
    return pa.table(
        {
            "label": pa.array(labels, pa.string()),
            "iri": pa.array(iris, pa.string()),
            "comment": pa.array(comments, pa.string()),
            "direct_classes": pa.array(direct, pa.list_(pa.string())),
            "all_classes": pa.array(allc, pa.list_(pa.string())),
            "properties": pa.array(
                props, pa.map_(pa.string(), pa.list_(pa.string()))
            ),
            "data_properties": pa.array(dps, dp_type),
            "personal_values_10": pa.array(pv10, pa.list_(pa.int8())),
            "personal_values_19": pa.array(pv19, pa.list_(pa.int8())),
            "political_value": pa.array(political, pa.list_(pa.int8())),
            "extra": pa.array(extra, pa.string()),
        }
    )


def edges_table(art: GraphArtifacts) -> pa.Table:
    subs, objs, preds, props = [], [], [], []
    for a, b, d in sorted(art.G.edges(data=True)):
        subs.append(a)
        objs.append(b)
        preds.append(d.get("type"))
        props.append(list((d.get("properties") or {}).items()))
    return pa.table(
        {
            "subject": pa.array(subs, pa.string()),
            "object": pa.array(objs, pa.string()),
            "predicate": pa.array(preds, pa.string()),
            "properties": pa.array(props, pa.map_(pa.string(), pa.list_(pa.string()))),
        }
    )


def graph_to_datasets(art: GraphArtifacts) -> dict[str, "rd.Dataset"]:
    """{'nodes': Dataset, 'edges': Dataset} with nested Arrow schemas."""
    return {
        "nodes": rd.from_arrow(nodes_table(art)),
        "edges": rd.from_arrow(edges_table(art)),
    }
