"""Hyperlink graph extraction over crawled pages — the crawl-side
companion to the KG edge pipeline.

Common-Crawl-style processing needs the LINK graph as well as the
knowledge graph: href targets per page (outlinks), resolved against the
page URL, then aggregated into per-target in-link counts (the raw
signal behind crawl frontier scheduling and PageRank seeding; the KG
pipeline's `functions/graph_algo.py:pagerank_fixed` consumes exactly
this edge shape).

Shuffle structure at 100 TB:

- :func:`extract_links` is embarrassingly parallel — one compiled-regex
  pass per page inside ``map_batches``, no exchange.  The per-page
  output is outlink-bounded (tens of rows), so blocks stay proportional
  to input blocks.
- :func:`inlink_counts` needs two bounded exchanges: total link counts
  flow through map-side-combined partials into ``grouped_sum`` (each
  block contributes at most distinct-dst rows), and distinct-source
  counts through ``grouped_count_distinct``'s pair-partitioned dedup
  (a hot target's sources still spread across partitions).  The two
  result legs meet on the dst key via the outer-safe bucketed join.

URL resolution contract (shared verbatim with the SQL oracle): an
``http(s)://`` href is kept as-is; a root-relative href (``/...``)
joins to the source page's scheme+host; anything else joins as
``scheme://host/<href>``.  This is the RFC 3986 subset that covers the
fixture corpus and the overwhelming share of real crawl hrefs;
path-relative ``../`` resolution is intentionally out of the checked
envelope (documented, like the OWL envelope in `ontology/owl_io.py`).

Reference anchor: the reference pipeline consumes curated source URLs
(`/root/reference/ontology_processing/graph_creation/process_causal_sources.py:63-67`);
this operator generalizes "where do edges/sources come from" to the
open web's link structure.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ray.data import Dataset

# one compiled pattern per worker process (module-level: compiled at
# import, not per batch); matches single- or double-quoted href values
_HREF_RE = re.compile(r"""href=["']([^"']*)["']""")
_HOST_RE = re.compile(r"^(https?://[^/]+)")


def extract_links(
    ds: Dataset,
    url_col: str = "url",
    html_col: str = "html",
) -> Dataset:
    """pages -> (src, dst) resolved link table (one row per href
    occurrence, duplicates kept — counts are meaningful downstream)."""

    def per_batch(b: pd.DataFrame) -> pd.DataFrame:
        raw = b[html_col]
        if len(raw) and isinstance(raw.iloc[0], (bytes, bytearray)):
            html = raw.map(lambda v: v.decode("utf-8", "replace") if v is not None else "")
        else:
            html = raw.fillna("")
        hits = html.str.findall(_HREF_RE)
        counts = hits.str.len().to_numpy()
        src = np.repeat(b[url_col].to_numpy(), counts)
        href = np.concatenate([np.asarray(h, dtype=object) for h in hits]) if counts.sum() else np.array([], dtype=object)
        out = pd.DataFrame({"src": src, "href": href})
        is_abs = out["href"].str.match(r"https?://")
        host = out["src"].str.extract(_HOST_RE, expand=False).fillna("")
        is_root = out["href"].str.startswith("/")
        out["dst"] = np.where(
            is_abs,
            out["href"],
            np.where(is_root, host + out["href"], host + "/" + out["href"]),
        )
        return out[["src", "dst"]]

    return ds.map_batches(per_batch, batch_format="pandas")


def inlink_counts(links: Dataset) -> Dataset:
    """(src, dst) link rows -> per-target (dst, n_links, n_src_pages)."""
    from .agg import grouped_count_distinct, grouped_sum
    from .join import bucketed_hash_join

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["dst"].value_counts()
        return pd.DataFrame(
            {"dst": vc.index.to_numpy(), "n_links": vc.to_numpy().astype("int64")}
        )

    totals = grouped_sum(
        links.map_batches(combine, batch_format="pandas"), ["dst"], ["n_links"]
    )
    srcs = grouped_count_distinct(links, "dst", "src", out_col="n_src_pages")
    joined = bucketed_hash_join(totals, srcs, "dst", join_type="left outer")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "dst": b["dst"],
                "n_links": b["n_links"].astype("int64"),
                "n_src_pages": b["n_src_pages"].fillna(0).astype("int64"),
            }
        )

    return joined.map_batches(finish, batch_format="pandas")
