"""Golden-artifact regression guard: the enrichment of the fixture must
match the committed tests/golden/enrichment.json byte-for-byte (modulo
JSON round-trip).  After an INTENTIONAL semantics change run
`python tools/regen_golden.py` and review the diff."""

import json
import os
import sys

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "enrichment.json")


def test_enrichment_matches_committed_golden():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.regen_golden import build_golden

    with open(GOLDEN) as f:
        committed = json.load(f)
    live = json.loads(json.dumps(build_golden(), default=str))
    assert live.keys() == committed.keys()
    for key in committed:
        assert live[key] == committed[key], f"golden drift in '{key}'"
