"""Deterministic synthetic climate ontology fixture.

Covers every reference code path (FIXTURES.md §2): the root
``increase in greenhouse effect``; a ``feedback loop`` node with a
``causes_or_promotes`` edge into an ``increase in atmospheric greenhouse
gas`` node (acyclic filter, ``make_graph_class.py:395-431``); mitigation
solutions with mixed null/non-null ``CO2_eq_reduced`` (sort + null tail,
``:466-495``); adaptation solutions; myths with ``myth_frequency`` and
``is_a_myth_about`` edges (``process_myths.py:19-56``); personal-value
carrying impact nodes; nodes hitting both valid and excluded
test-ontology class sets (``ontology_processing_utils.py:94-142``);
edges whose endpoints share source URLs (edge-property intersection,
``make_graph_class.py:306-354``) including invalid URL strings
(``process_causal_sources.py:61``); class-level object properties and an
individual-parent class (``is_a`` emission, ``network_class.py:109-110``).

Everything is seeded and wall-clock-free: the same arguments always
produce the same snapshot.
"""

from __future__ import annotations

import hashlib
import random

from .schema import OntologySnapshot, empty_data_properties, empty_properties
from .vocab import (
    RAW_CAUSES,
    RAW_EXPOSURE,
    RAW_INHIBITS,
    RAW_MYTH_ABOUT,
    RAW_POPULATION,
    CLIMATE_MIND,
)


def _iri(label: str) -> str:
    h = hashlib.sha256(label.encode()).hexdigest()[:22]
    return f"webprotege.stanford.edu.R{h}"


def _mk_node(
    label: str,
    classes: tuple[str, ...],
    *,
    comment: str = "",
    sources: dict | None = None,
    data: dict | None = None,
    aliases: tuple[str, ...] = (),
) -> dict:
    props = empty_properties()
    if sources:
        for k, v in sources.items():
            props[k] = list(v)
    dp = empty_data_properties()
    if data:
        dp.update(data)
    surface_forms = [label, label.title()]
    if " " in label:
        first, rest = label.split(" ", 1)
        surface_forms.append(f"{first}-{rest.replace(' ', '-')}")
    surface_forms.extend(aliases)
    return {
        "label": label,
        "iri": _iri(label),
        "comment": comment or f"[locstr('{label}', 'en')]",
        "direct_classes": list(classes),
        "properties": props,
        "data_properties": dp,
        "surface_forms": surface_forms,
    }


# Class hierarchy: class label -> parent class labels.  Direct children of
# "climate mind" are the superclasses that become dynamic node-attribute
# keys (make_graph_class.py:94-95, :147-158) — including "myth",
# "risk solution" and "test ontology", whose presence as top-level keys the
# downstream stages test (process_myths.py:24, :33; make_graph_class.py:385).
_CLASS_PARENTS: dict[str, tuple[str, ...]] = {
    "climate issue": (CLIMATE_MIND,),
    "risk solution": (CLIMATE_MIND,),
    "myth": (CLIMATE_MIND,),
    "test ontology": (CLIMATE_MIND,),
    "exposure": (CLIMATE_MIND,),
    # climate issue subtree
    "root cause linked to humans": ("climate issue",),
    "increase in atmospheric greenhouse gas": ("climate issue",),
    "feedback loop": ("climate issue",),
    "environmental impact": ("climate issue",),
    "health impact": ("climate issue",),
    "social impact": ("climate issue",),
    # risk solution subtree (labels in the excluded test-ontology set,
    # ontology_processing_utils.py:126-142)
    "mitigation": ("risk solution",),
    "adaptation": ("risk solution",),
    # exposure subtree
    "exposure condition": ("exposure",),
    "vulnerable population": ("exposure",),
    # test ontology / personal values subtree (valid test-ontology set,
    # ontology_processing_utils.py:94-123)
    "personal value": ("test ontology",),
    "achievement": ("personal value",),
    "benevolence": ("personal value",),
    "benevolence caring": ("benevolence",),
    "benevolence dependability": ("benevolence",),
    "security": ("personal value",),
    "security personal": ("security",),
    "security societal": ("security",),
    "universalism": ("personal value",),
    "universalism concern": ("universalism",),
    "universalism nature": ("universalism",),
    "universalism tolerance": ("universalism",),
}

_IPCC = "https://www.ipcc.ch/report/ar6/wg1/"
_NASA = "https://climate.nasa.gov/evidence/"
_NOAA = "https://www.noaa.gov/climate"
_DRAWDOWN = "https://drawdown.org/solutions"
_BAD_URL = "not a real url"


def build_fixture_snapshot(extra_chain_nodes: int = 40, seed: int = 7) -> OntologySnapshot:
    """Build the deterministic fixture snapshot.

    ``extra_chain_nodes`` appends seeded filler cause-effect chains below
    the core graph so the ontology lands in the 60-200 node range of
    FIXTURES.md §2 and gives the canonicalization shuffle real key counts.
    """
    rng = random.Random(seed)
    nodes: list[dict] = []
    obj_edges: list[tuple[str, str, str]] = []

    def add(node: dict) -> str:
        nodes.append(node)
        return node["label"]

    def causes(s: str, o: str) -> None:
        obj_edges.append((s, RAW_CAUSES, o))

    def inhibited_by(problem: str, solution: str) -> None:
        # assertion lives on the problem node: problem --INHIBITS--> solution
        # (triple emission order at network_class.py:57; consumed with the
        # solution as edge *target* at make_graph_class.py:459-461)
        obj_edges.append((problem, RAW_INHIBITS, solution))

    # --- upstream causes -------------------------------------------------
    add(_mk_node("burning of fossil fuels", ("root cause linked to humans",),
                 sources={"dc_source": [_IPCC], "schema_governmentSource": [_NOAA]}))
    add(_mk_node("deforestation", ("root cause linked to humans",),
                 sources={"dc_source": [_IPCC]}))
    add(_mk_node("livestock farming", ("root cause linked to humans",),
                 sources={"schema_academicBook": ["https://ourworldindata.org/food"]}))
    add(_mk_node("increase in atmospheric co2", ("increase in atmospheric greenhouse gas",),
                 sources={"dc_source": [_IPCC, _NASA], "schema_governmentSource": [_NOAA]},
                 aliases=("atmospheric CO2 increase", "rising CO2 levels")))
    add(_mk_node("increase in atmospheric methane", ("increase in atmospheric greenhouse gas",),
                 sources={"dc_source": [_NASA], "schema_mediaSource": [_BAD_URL]}))
    add(_mk_node("permafrost thaw", ("feedback loop",),
                 sources={"dc_source": [_NASA]}))

    # --- the root --------------------------------------------------------
    add(_mk_node("increase in greenhouse effect", ("environmental impact",),
                 sources={"dc_source": [_IPCC, _NASA]},
                 aliases=("enhanced greenhouse effect",)))

    # --- downstream impacts ---------------------------------------------
    add(_mk_node("global warming", ("environmental impact",),
                 sources={"dc_source": [_NASA], "schema_mediaSource": [_BAD_URL]},
                 aliases=("climate change", "warming of the planet")))
    add(_mk_node("sea level rise", ("environmental impact",),
                 sources={"dc_source": [_NASA]}))
    add(_mk_node("ocean acidification", ("environmental impact",),
                 sources={"schema_academicSourceNoPaywall": [_NOAA]}))
    add(_mk_node("increase in extreme heat events", ("environmental impact",),
                 sources={"schema_governmentSource": [_NOAA]}))
    add(_mk_node("coastal flooding", ("environmental impact",),
                 sources={"dc_source": [_NASA]},
                 data={"universalism_concern": 1, "security_societal": 1}))
    add(_mk_node("displacement of communities", ("social impact",),
                 data={"universalism_concern": 1, "benevolence_caring": 1,
                       "security_societal": 1, "conservative": 0, "liberal": 1}))
    add(_mk_node("increase in heat related illness", ("health impact",),
                 data={"security_personal": 1, "benevolence_caring": 1},
                 sources={"schema_governmentSource": [_NOAA]}))
    add(_mk_node("decrease in crop yields", ("environmental impact",),
                 data={"security_societal": 1}))
    add(_mk_node("increase in food insecurity", ("social impact",),
                 data={"security_societal": 1, "universalism_concern": 1,
                       "benevolence_caring": 1}))

    causes("burning of fossil fuels", "increase in atmospheric co2")
    causes("deforestation", "increase in atmospheric co2")
    causes("livestock farming", "increase in atmospheric methane")
    causes("increase in atmospheric co2", "increase in greenhouse effect")
    causes("increase in atmospheric methane", "increase in greenhouse effect")
    causes("increase in greenhouse effect", "global warming")
    causes("global warming", "sea level rise")
    causes("global warming", "ocean acidification")
    causes("global warming", "increase in extreme heat events")
    causes("global warming", "permafrost thaw")
    # feedback-loop edge removed by make_acyclic (make_graph_class.py:395-431)
    causes("permafrost thaw", "increase in atmospheric methane")
    causes("sea level rise", "coastal flooding")
    causes("coastal flooding", "displacement of communities")
    causes("increase in extreme heat events", "increase in heat related illness")
    causes("increase in extreme heat events", "decrease in crop yields")
    causes("decrease in crop yields", "increase in food insecurity")

    # --- mitigation solutions (mixed CO2_eq_reduced, make_graph_class.py:466-495)
    add(_mk_node("onshore wind energy", ("mitigation",),
                 data={"CO2_eq_reduced": 47.2},
                 sources={"schema_organizationSource": [_DRAWDOWN], "dc_source": [_IPCC]}))
    add(_mk_node("utility scale solar energy", ("mitigation",),
                 data={"CO2_eq_reduced": 42.3},
                 sources={"schema_organizationSource": [_DRAWDOWN]}))
    add(_mk_node("reduced food waste", ("mitigation",),
                 data={"CO2_eq_reduced": 90.7},
                 sources={"schema_organizationSource": [_DRAWDOWN]}))
    add(_mk_node("public transit adoption", ("mitigation",),
                 data={"CO2_eq_reduced": 7.5, "conservative": 0, "liberal": 1}))
    add(_mk_node("home insulation retrofit", ("mitigation",)))          # null CO2 tail
    add(_mk_node("carbon tax policy", ("mitigation",),
                 data={"conservative": -1, "liberal": 1}))              # null CO2 tail

    inhibited_by("increase in atmospheric co2", "onshore wind energy")
    inhibited_by("increase in atmospheric co2", "utility scale solar energy")
    inhibited_by("increase in atmospheric co2", "carbon tax policy")
    inhibited_by("burning of fossil fuels", "public transit adoption")
    inhibited_by("increase in atmospheric methane", "reduced food waste")

    # --- adaptation solutions -------------------------------------------
    add(_mk_node("sea wall construction", ("adaptation",),
                 sources={"schema_governmentSource": [_NOAA]}))
    add(_mk_node("heat early warning system", ("adaptation",),
                 sources={"schema_governmentSource": [_NOAA]}))
    add(_mk_node("drought resistant crops", ("adaptation",),
                 sources={"schema_academicSourceWithPaywall": ["https://doi.org/10.1000/xyz"]}))

    inhibited_by("coastal flooding", "sea wall construction")
    inhibited_by("increase in heat related illness", "heat early warning system")
    inhibited_by("decrease in crop yields", "drought resistant crops")

    # --- myths (class "myth" => dynamic top-level key, process_myths.py:24)
    add(_mk_node("myth that climate has always changed", ("myth",),
                 data={"myth": True, "myth_frequency": 97.0},
                 sources={"schema_mediaSource": ["https://skepticalscience.com/argument1"],
                          "dc_source": ["https://skepticalscience.com/argument1"]}))
    add(_mk_node("myth that co2 is plant food", ("myth",),
                 data={"myth": True, "myth_frequency": 80.0},
                 sources={"schema_mediaSource": ["https://skepticalscience.com/argument2"]}))
    add(_mk_node("myth that wind turbines harm health", ("myth",),
                 data={"myth": True, "myth_frequency": 12.0},
                 sources={"schema_mediaSource": ["https://skepticalscience.com/argument3"]}))
    add(_mk_node("myth that sea levels are not rising", ("myth",),
                 data={"myth": True, "myth_frequency": 35.0},
                 sources={"schema_mediaSource": ["https://skepticalscience.com/argument4"]}))

    obj_edges.append(("myth that climate has always changed", RAW_MYTH_ABOUT, "global warming"))
    obj_edges.append(("myth that co2 is plant food", RAW_MYTH_ABOUT, "increase in atmospheric co2"))
    obj_edges.append(("myth that wind turbines harm health", RAW_MYTH_ABOUT, "onshore wind energy"))
    obj_edges.append(("myth that sea levels are not rising", RAW_MYTH_ABOUT, "sea level rise"))

    # --- exposure / population ------------------------------------------
    add(_mk_node("person is elderly", ("exposure condition",)))
    add(_mk_node("person works outdoors", ("exposure condition",)))
    add(_mk_node("people living in coastal areas", ("vulnerable population",)))

    obj_edges.append(("increase in heat related illness", RAW_EXPOSURE, "person is elderly"))
    obj_edges.append(("increase in heat related illness", RAW_EXPOSURE, "person works outdoors"))
    obj_edges.append(("coastal flooding", RAW_POPULATION, "people living in coastal areas"))

    # --- test-ontology individuals (valid classes; survive the test filter)
    add(_mk_node("importance of security", ("security societal",),
                 data={"security_societal": 1}))
    add(_mk_node("importance of caring", ("benevolence caring",),
                 data={"benevolence_caring": 1}))
    causes("importance of security", "importance of caring")

    # --- class-level object properties (network_class.py:73-77): every
    # individual whose ancestor classes include "health impact" also emits
    # this exposure edge.
    class_obj_edges = [("health impact", RAW_EXPOSURE, "person is elderly")]
    # class with an individual parent => is_a emission (network_class.py:109-110)
    class_individual_parents = [("vulnerable population", "person is elderly")]

    # --- seeded filler chains below "increase in food insecurity" --------
    impact_classes = ("environmental impact", "health impact", "social impact")
    prev = ["increase in food insecurity", "displacement of communities", "ocean acidification"]
    for i in range(extra_chain_nodes):
        label = f"secondary impact {i:02d}"
        cls = impact_classes[i % len(impact_classes)]
        srcs = {}
        if i % 3 == 0:
            srcs["dc_source"] = [f"https://example.org/study/{i:03d}"]
        data = {}
        if i % 5 == 0:
            data["universalism_nature"] = 1
        if i % 7 == 0:
            data["tradition"] = -1 if i % 2 else 1
        add(_mk_node(label, (cls,), sources=srcs, data=data))
        causes(rng.choice(prev), label)
        if i % 4 == 1:
            causes(rng.choice(prev), label)  # second parent; edges always point
            # old -> new so the filler region stays a DAG (T7 reach/coreach
            # replacement assumes acyclicity after M11, SURVEY §2.6)
        prev.append(label)

    individuals = {n["label"]: n for n in nodes}
    # sanity: every edge endpoint must be a known individual
    for s, _, o in obj_edges:
        assert s in individuals and o in individuals, (s, o)

    return OntologySnapshot(
        individuals=individuals,
        class_parents=dict(_CLASS_PARENTS),
        obj_edges=obj_edges,
        class_obj_edges=class_obj_edges,
        class_individual_parents=class_individual_parents,
    )
