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


def _resolve(src: pd.Series, href: pd.Series) -> np.ndarray:
    """Vectorized href resolution (the URL contract above): absolute
    kept, root-relative joins scheme+host, else scheme+host+'/'+href."""
    is_abs = href.str.match(r"https?://")
    host = src.str.extract(_HOST_RE, expand=False).fillna("")
    is_root = href.str.startswith("/")
    return np.where(is_abs, href, np.where(is_root, host + href, host + "/" + href))


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
        out["dst"] = _resolve(out["src"], out["href"])
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


# anchor contract (shared with the SQL oracle): single-quoted hrefs,
# PLAIN anchor text only (the pattern requires </a> right after the
# text — anchors with nested markup are out of the checked envelope,
# like ../ path resolution above); text normalized LOWER(TRIM(.)).
_ANCHOR_RE = re.compile(r"<a [^>]*?href='([^']*)'[^>]*>([^<]*)</a>")


def anchor_texts(
    ds: Dataset,
    url_col: str = "url",
    html_col: str = "html",
) -> Dataset:
    """Per-target anchor-text index: (url, anchor, n) — the web-retrieval
    alias/ranking signal (anchor text describes the TARGET page).

    Zero-shuffle regex pass (pandas ``str.extractall`` — both capture
    groups in one vectorized call), resolution shared with
    :func:`extract_links`, then map-side (dst, anchor) combine feeding
    ONE grouped_sum exchange; output is bounded by distinct
    (target, anchor) pairs.
    """
    from .agg import grouped_sum

    def per_batch(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)  # extractall level-0 must be positional
        raw = b[html_col]
        if len(raw) and isinstance(raw.iloc[0], (bytes, bytearray)):
            html = raw.map(lambda v: v.decode("utf-8", "replace") if v is not None else "")
        else:
            html = raw.fillna("")
        hits = html.str.extractall(_ANCHOR_RE)
        if not len(hits):
            return pd.DataFrame(
                {"url": pd.Series([], dtype=str),
                 "anchor": pd.Series([], dtype=str),
                 "n": pd.Series([], dtype="int64")}
            )
        src = b[url_col].to_numpy()[hits.index.get_level_values(0).to_numpy()]
        out = pd.DataFrame(
            {
                "url": _resolve(pd.Series(src), hits[0].reset_index(drop=True)),
                "anchor": hits[1].str.strip().str.lower().to_numpy(),
            }
        )
        return (
            out.groupby(["url", "anchor"], sort=False)
            .size()
            .reset_index(name="n")
            .astype({"n": "int64"})
        )

    return grouped_sum(
        ds.map_batches(per_batch, batch_format="pandas"), ["url", "anchor"], ["n"]
    )
