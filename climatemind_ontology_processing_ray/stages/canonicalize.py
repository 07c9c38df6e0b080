"""Canonicalization shuffles (SURVEY §7.3; north_star "groupby-aggregate
shuffle on normalized surface-form keys with explicit salting for
head-entity skew").

Both canonicalizers follow the same two-phase salted pattern:

1. **map-side combine** — inside ``map_batches``, aggregate per batch so
   each (key, salt) pair contributes at most one row per block to the
   shuffle.  Head keys ("climate change" appears on >=20% of pages) shrink
   from millions of rows to (#blocks x #salts) rows before any exchange.
2. **salted groupby** — group on (key..., salt): a hot key's partials
   spread over ``num_salts`` reducers instead of one.
3. **final groupby** — group on the bare key over the tiny salted output.

At 10^12-document scale phase 1 is the only heavy exchange and its
per-reducer load is bounded by ``total_blocks / num_salts`` rows per hot
key; phase 2's input is ontology-sized x num_salts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset
from ray.data.aggregate import Sum

from ..functions.partitioning import adaptive_parts

TRIPLE_KEY = ["subject", "object", "predicate"]


def _salt_vec(values, num_salts: int) -> np.ndarray:
    """Vectorized deterministic salt: fixed-key SipHash over the string
    column (pd.util.hash_array iterates in C; no PYTHONHASHSEED
    dependence, no per-row Python — replaces the round-3 per-row crc32).
    Salt assignment is pure partitioning: every downstream merge groups
    on the real key, and the sources cap keeps the lexicographically
    smallest urls under ANY partitioning (each partial keeps its own
    smallest ``cap``, and a globally-smallest url is always among its
    partition's smallest), so outputs are salt-invariant."""
    arr = np.asarray(values, dtype=object)
    return (pd.util.hash_array(arr, categorize=False) % np.uint64(num_salts)).astype(
        np.int32
    )


def _salt_of(value: str, num_salts: int) -> int:
    return int(_salt_vec([value], num_salts)[0])


def _part_vec(df: pd.DataFrame, cols: list[str], num_parts: int) -> np.ndarray:
    """Vectorized partition id over multiple key columns (fixed-key row
    hash, C-speed)."""
    h = pd.util.hash_pandas_object(df[cols], index=False, categorize=False)
    return (h.to_numpy() % np.uint64(num_parts)).astype(np.int32)


def partial_triple_agg(
    batch: pd.DataFrame, num_salts: int = 16, sources_cap: int = 8
) -> pd.DataFrame:
    """Map-side combine: linked triple rows -> one partial row per
    (subject, object, predicate) per batch, salted by first source url."""
    df = pd.DataFrame(
        {
            "subject": batch["subj_label"],
            "object": batch["obj_label"],
            "predicate": batch["predicate"],
            "url": batch["url"],
        }
    )
    grouped = df.groupby(TRIPLE_KEY, sort=False).agg(
        support=("url", "size"),
        sources=("url", lambda s: sorted(set(s))[:sources_cap]),
    )
    out = grouped.reset_index()
    first_url = [u[0] if u else s for s, u in zip(out["subject"], out["sources"])]
    out["salt"] = _salt_vec(first_url, num_salts)
    return out


_NUM_PARTS = 64  # legacy fallback (adaptive_parts sizes real exchanges)


def _merge_partition(g: pd.DataFrame, keys: list[str], sources_cap: int) -> pd.DataFrame:
    """Vectorized in-partition merge: ONE pandas groupby per partition
    instead of one Ray group per key (each Ray group costs ~0.25 ms of
    scheduling; with noisy web extraction the distinct pre-link triple
    count is large — the coarse-partition pattern from exact_dedup)."""

    def merge_sources(series) -> list[str]:
        urls: set[str] = set()
        for lst in series:
            urls.update(lst)
        return sorted(urls)[:sources_cap]

    out = (
        g.groupby(keys, sort=False)
        .agg(support=("support", "sum"), sources=("sources", merge_sources))
        .reset_index()
    )
    out["support"] = out["support"].astype("int64")
    return out


# streaming fan-in combine: bundle many small partial blocks into one
# merge task (ray bundles input blocks up to batch_size rows), so the
# sort-based groupby that follows sees FEW large blocks instead of one
# tiny block per upstream task.  Merging is associative (support sum;
# sources = 8 lexicographically-smallest urls, a top-k monoid), so this
# is a correctness-preserving tree-reduce level.  At bench scale it cuts
# the two sorts from 96 blocks (384 sub-ms SortMap/SortReduce tasks +
# barrier bookkeeping) to ~1-2 blocks; at web scale it is one extra
# linear streaming pass that never hurts the shuffle that follows.
# sized so several combine tasks stream DURING the extract stage instead
# of one combine acting as a pseudo-barrier after it (measured: 65k rows
# = 1 task waiting on ~all upstream blocks added ~1-2s of serial tail at
# 16 cpus; 16k rows = ~4 overlapped tasks, sort still sees O(4) blocks)
_FANIN_ROWS = 16_384


def canonicalize_partials(
    partials: Dataset,
    sources_cap: int = 8,
    fanin_rows: int = _FANIN_ROWS,
    num_parts: int | None = None,
) -> Dataset:
    """Shuffle phases over pre-combined partial rows: streaming fan-in
    combine, salted coarse groupby, fan-in, then final coarse groupby
    (each hot key spread across its salts first; per-key merging is
    vectorized inside each partition).  Exchange fan-out scales with the
    input row estimate (functions/partitioning.py)."""
    if num_parts is None:
        num_parts = adaptive_parts(partials)

    def combine_salted(b: pd.DataFrame) -> pd.DataFrame:
        return _merge_partition(b, TRIPLE_KEY + ["salt"], sources_cap)

    def combine_final(b: pd.DataFrame) -> pd.DataFrame:
        return _merge_partition(b, TRIPLE_KEY, sources_cap)

    if fanin_rows:
        # num_cpus=0.5 keeps this stage UNFUSED from the upstream heavy
        # map (fusion would bundle the extractor's inputs up to
        # fanin_rows pages per task, wrecking its task granularity);
        # the merge itself is a light pandas groupby over partial rows
        partials = partials.map_batches(
            combine_salted,
            batch_format="pandas",
            batch_size=fanin_rows,
            num_cpus=0.5,
        )

    def tag_salted(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__part"] = _part_vec(b, TRIPLE_KEY + ["salt"], num_parts)
        return b

    def merge_salted(g: pd.DataFrame) -> pd.DataFrame:
        return _merge_partition(g, TRIPLE_KEY + ["salt"], sources_cap)

    def tag_final(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__part"] = _part_vec(b, TRIPLE_KEY, num_parts)
        return b

    def merge_final(g: pd.DataFrame) -> pd.DataFrame:
        return _merge_partition(g, TRIPLE_KEY, sources_cap)

    salted = (
        partials.map_batches(tag_salted, batch_format="pandas")
        .groupby("__part")
        .map_groups(merge_salted, batch_format="pandas")
    )
    if fanin_rows:
        # cross-salt pre-merge (also associative) so the final sort sees
        # ~distinct-key rows in O(1) blocks
        salted = salted.map_batches(
            combine_final, batch_format="pandas", batch_size=fanin_rows, num_cpus=0.5
        )
    return (
        salted.map_batches(tag_final, batch_format="pandas")
        .groupby("__part")
        .map_groups(merge_final, batch_format="pandas")
    )


def canonicalize_triples(
    linked: Dataset,
    num_salts: int = 16,
    sources_cap: int = 8,
) -> Dataset:
    """linked triples -> canonical edge table.

    Output schema = the reference's ``output.csv`` columns
    (``make_network.py:41-45``) plus aggregation columns::

        subject, object, predicate, support (int64), sources (list<string>)

    ``support`` counts supporting (url, sentence) extractions — the G1
    exact-dedup capability with provenance kept; ``sources`` keeps up to
    ``sources_cap`` distinct source urls (G5 grouped set-union semantics,
    ``make_graph_class.py:336-350``).
    """

    partials = linked.map_batches(
        lambda b: partial_triple_agg(b, num_salts, sources_cap),
        batch_format="pandas",
    )
    return canonicalize_partials(partials, sources_cap)


def canonicalize_mentions(
    mentions: Dataset,
    num_salts: int = 16,
    surface_index: dict[str, str] | None = None,
) -> Dataset:
    """mention rows -> per-surface-form counts: the mention-canonicalization
    shuffle keyed on ``surface_norm``.

    Output: surface_norm, n_mentions (int64) and — when the (small,
    broadcast) ``surface_index`` is given — node_label (nullable).
    Pure ``Sum`` aggregation; partial counts are pre-combined per batch so
    the exchange carries at most (#blocks x #salts) rows per key, and the
    salted stage splits each hot key over ``num_salts`` reducers.
    ``node_label`` is functionally dependent on ``surface_norm``, so it is
    re-attached after aggregation by broadcast lookup instead of being
    shuffled alongside every row.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "surface_norm": batch["surface_norm"],
                "salt": _salt_vec(batch["url"].to_numpy(dtype=object), num_salts),
            }
        )
        return (
            df.groupby(["surface_norm", "salt"], sort=False)
            .size()
            .rename("partial_count")
            .reset_index()
        )

    partials = mentions.map_batches(partial, batch_format="pandas")
    salted = partials.groupby(["surface_norm", "salt"]).aggregate(
        Sum("partial_count", alias_name="salted_count")
    )
    final = salted.groupby("surface_norm").aggregate(
        Sum("salted_count", alias_name="n_mentions")
    )
    if surface_index is None:
        return final

    import ray

    index_ref = ray.put(surface_index)

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.broadcast import cached_get

        idx = cached_get(index_ref)
        batch["node_label"] = [idx.get(s) for s in batch["surface_norm"]]
        return batch

    return final.map_batches(attach, batch_format="pandas")
