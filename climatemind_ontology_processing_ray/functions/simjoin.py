"""Exact set-similarity self-join via prefix filtering (the
All-Pairs / PPJoin family — Bayardo et al. WWW'07, Xiao et al. WWW'08):
every pair with Jaccard >= t over word-n-gram shingle sets, with NO
approximation (contrast ``minhash_lsh_pairs``, which trades recall for
bucket locality) and NO caller-supplied blocking key (contrast
``ngram_jaccard_pairs``).

The scale lever is the prefix filter: order each document's shingles by
ascending global document frequency (rarest first) and keep only the
first ``|T| - ceil(t*|T|) + 1`` as candidate-generation keys — any pair
with J >= t must share at least one PREFIX shingle, and prefix shingles
are by construction the rare ones, so the per-shingle candidate buckets
stay small where a naive inverted index would explode on stopword
shingles.

Shuffle structure (every exchange is a hash partition; nothing
corpus-sized touches the driver):

1. (doc, shingle) distinct pairs per batch (map-only),
2. shingle document frequencies   — grouped_sum,
3. df attached to each pair       — bucketed hash join on shingle,
4. per-doc prefix selection       — coarse hash(doc) partition groupby,
5. candidate pairs per prefix-shingle bucket — coarse hash(shingle)
   partition groupby + pair dedup,
6. exact verify                   — two bucketed joins attach both
   docs' full shingle lists; intersection counted per pair.

Output is EXACT-integer (n_inter, n_union) with the threshold applied
as ``n_inter * den >= num * n_union`` — no float crosses a partition
boundary, so an oracle can replay the result bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ray.data import Dataset

_NUM_PARTS = 64


def _sql_style_shingles(text: str, n: int) -> list[str]:
    """n-gram shingles over LOWER(text) split on single spaces —
    mirrors ``STRING_SPLIT(LOWER(text), ' ')`` (empty tokens from runs
    of spaces are KEPT, unlike ``str.split()``), so an independent SQL
    evaluation produces the identical set."""
    words = (text or "").lower().split(" ")
    if len(words) < n:
        return []
    return sorted({" ".join(words[i : i + n]) for i in range(len(words) - n + 1)})


def similarity_join(
    ds: Dataset,
    id_col: str,
    text_col: str = "text",
    *,
    ngram: int = 3,
    threshold_num: int = 6,
    threshold_den: int = 10,
    num_parts: int | None = None,
    verify_broadcast_threshold: int = 200_000,
    df_broadcast_threshold: int = 2_000_000,
) -> Dataset:
    """All pairs with Jaccard(shingles(a), shingles(b)) >= num/den.

    Returns (id_a, id_b, n_inter, n_union) rows, id_a < id_b.
    """
    from .agg import grouped_sum
    from .join import bucketed_hash_join, hash_bucket
    from .partitioning import adaptive_parts

    if num_parts is None:
        num_parts = adaptive_parts(ds)

    t = threshold_num / threshold_den

    def shingle_pairs(b: pd.DataFrame) -> pd.DataFrame:
        ids, toks = [], []
        for i, txt in zip(b[id_col], b[text_col]):
            for s in _sql_style_shingles(txt, ngram):
                ids.append(i)
                toks.append(s)
        return pd.DataFrame({"doc": ids, "token": toks})

    # three consumers (df pass, df join, verify) — shingle once
    tok = ds.map_batches(shingle_pairs, batch_format="pandas").materialize()

    # shingle document frequency — per-batch value_counts pre-combines
    # BEFORE the exchange (each block contributes one row per distinct
    # shingle, not one per occurrence)
    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["token"].value_counts()
        return pd.DataFrame(
            {"token": vc.index, "c": vc.to_numpy().astype("int64")}
        )

    dfreq = grouped_sum(
        tok.map_batches(df_partial, batch_format="pandas"), ["token"], ["c"], num_parts
    ).map_batches(
        lambda b: b.rename(columns={"c": "df"}), batch_format="pandas"
    )

    # attach df.  The shingle-frequency table is vocabulary-sized; below
    # the threshold it broadcasts once via ray.put and the attach is a
    # map-only pass (skipping a full hash join of the exploded shingle
    # table).  Above it, the bucketed hash join is the scale path.
    ddf = dfreq.to_pandas()
    if len(ddf) <= df_broadcast_threshold:
        import ray

        df_ref = ray.put(dict(zip(ddf["token"], ddf["df"].astype("int64"))))

        def attach_df(b: pd.DataFrame) -> pd.DataFrame:
            from .broadcast import cached_get

            dm = cached_get(df_ref)
            return b.assign(df=b["token"].map(dm).astype("int64"))

        with_df = tok.map_batches(attach_df, batch_format="pandas")
    else:
        with_df = bucketed_hash_join(tok, dfreq, "token")

    # prefix selection, fully vectorized per partition: sort by
    # (doc, df, token), rank rows within each doc via cumcount, keep
    # rank < n - ceil(t*n) + 1
    def prefix_of(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc", "df", "token"], kind="mergesort")
        grp = g.groupby("doc", sort=False)
        n = grp["token"].transform("size").to_numpy()
        rank = grp.cumcount().to_numpy()
        keep = rank < (n - np.ceil(t * n).astype(np.int64) + 1)
        out = g.loc[keep, ["token", "doc"]].copy()
        out["n"] = n[keep]
        out["n"] = out["n"].astype("int64")
        out["pos"] = rank[keep].astype("int64")  # df-order position
        return out

    prefixes = (
        with_df.map_batches(
            lambda b: b.assign(__part=hash_bucket(b.doc.to_numpy(), num_parts)),
            batch_format="pandas",
        )
        .groupby("__part")
        .map_groups(prefix_of, batch_format="pandas")
    )

    # candidate pairs per prefix-shingle bucket, vectorized: pandas
    # self-merge on token (collision rows only), ordered + size-filtered
    # with array ops
    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Size-filtered pairs generated directly from each token's
        size-SORTED posting (the PPJoin length-window): for row i the
        valid partners are the contiguous slice of larger-or-equal-size
        rows with n_j*num <= n_i*den, found with one global searchsorted
        over (token_code, n)-composite keys — the k^2 self-merge the
        previous version filtered AFTER materializing never exists (on
        degenerate corpora raw merge rows ran 1000x the true pairs)."""
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
            }
        )
        dup = g[g.duplicated("token", keep=False)][["token", "doc", "n", "pos"]]
        if not len(dup):
            return empty
        dup = dup.sort_values(["token", "n", "doc"], kind="mergesort")
        # sorted by token => first-appearance factorize codes are
        # nondecreasing, so composite keys are globally sorted
        codes = pd.factorize(dup["token"], sort=False)[0].astype(np.int64)
        n = dup["n"].to_numpy()
        doc = dup["doc"].to_numpy()
        pos = dup["pos"].to_numpy()
        K = np.int64(n.max()) + 1
        keys = codes * K + n
        # size filter: J >= t forces t*max <= min, i.e. n_j <= n_i*den/num.
        # Clamp the offset at K-1: for t < 1 the raw bound exceeds K and
        # would spill the searchsorted window past this token's key run
        # into the next token code (spurious cross-token candidates —
        # correct output, inflated candidate volume on skewed buckets).
        bound = codes * K + np.minimum((n * threshold_den) // threshold_num, K - 1)
        up = np.searchsorted(keys, bound, side="right") - 1
        idx = np.arange(len(keys))
        w = np.maximum(up - idx, 0)
        total = int(w.sum())
        if total == 0:
            return empty
        starts = np.concatenate(([0], np.cumsum(w)[:-1]))
        offs = np.arange(total) - np.repeat(starts, w)
        ia = np.repeat(idx, w)
        ib = ia + 1 + offs
        # positional filter (PPJoin): overlap through THIS shared token is
        # bounded by 1 + min remaining suffix; a truly-similar pair always
        # survives at its FIRST shared prefix token (which has the loosest
        # bound), so per-occurrence filtering is exact
        na, nb = n[ia], n[ib]
        alpha = (threshold_num * (na + nb) + (threshold_num + threshold_den) - 1) // (
            threshold_num + threshold_den
        )
        ubound = 1 + np.minimum(na - pos[ia] - 1, nb - pos[ib] - 1)
        keep = ubound >= alpha
        ia, ib = ia[keep], ib[keep]
        if not len(ia):
            return empty
        da, db = doc[ia], doc[ib]
        out = pd.DataFrame(
            {"id_a": np.minimum(da, db), "id_b": np.maximum(da, db)}
        ).drop_duplicates()
        return pd.DataFrame(
            {
                "id_a": out.id_a.astype("int64").to_numpy(),
                "id_b": out.id_b.astype("int64").to_numpy(),
            }
        )

    cand = (
        prefixes.map_batches(
            lambda b: b.assign(__part=hash_bucket(b.token.to_numpy(), num_parts)),
            batch_format="pandas",
        )
        .groupby("__part")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    # a pair can share several prefix shingles (possibly in different
    # buckets): exact pair dedup.  The partition tag is a NUMERIC mix of
    # the two int ids — string-concat keys over tens of millions of
    # candidate rows were the measured hot spot on degenerate corpora
    # (tiny vocabularies make prefixes common, so raw candidates can be
    # 1000x the true pair count)
    def pair_tag(b: pd.DataFrame) -> pd.DataFrame:
        mix = (
            b.id_a.to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + b.id_b.to_numpy().astype(np.uint64)
        )
        return b.assign(__part=(mix % np.uint64(num_parts)).astype(np.int32))

    cand = (
        cand.map_batches(pair_tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(
            lambda g: g[["id_a", "id_b"]].drop_duplicates(),
            batch_format="pandas",
        )
        .materialize()
    )

    def _verify_rows(pairs_df: pd.DataFrame, lookup) -> pd.DataFrame:
        """lookup: doc -> frozenset of shingles (already split)."""
        rows = {"id_a": [], "id_b": [], "n_inter": [], "n_union": []}
        for ia, ib in zip(pairs_df.id_a, pairs_df.id_b):
            sa, sb = lookup[ia], lookup[ib]
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if inter * threshold_den >= threshold_num * union:
                rows["id_a"].append(ia)
                rows["id_b"].append(ib)
                rows["n_inter"].append(inter)
                rows["n_union"].append(union)
        return pd.DataFrame(
            {k: pd.Series(v, dtype="int64") for k, v in rows.items()}
        )

    # ---- verify.  The candidate DOC set is output-adjacent (docs that
    # share a rare prefix shingle), orders of magnitude below the corpus.
    # Small case (the common one): prune the shingle table to candidate
    # docs, broadcast {doc -> frozenset} once via ray.put, verify as a
    # map-only pass — no join ships the (long) token lists per PAIR.
    # Above the threshold: two bucketed joins attach \x1f-joined lists
    # (ragged object lists are not a valid Arrow column) with a per-batch
    # split cache, everything hash-partitioned.  Same structure as the
    # MinHash verify (functions/dedup.py) and documented there.
    if cand.count() == 0:
        return cand.map_batches(
            lambda b: pd.DataFrame(
                {k: pd.Series([], dtype="int64")
                 for k in ("id_a", "id_b", "n_inter", "n_union")}
            ),
            batch_format="pandas",
        )
    # the candidate DOC set stays distributed until it is provably small:
    # distinct ids via a coarse dedup (bounded by the corpus doc count,
    # NOT the candidate pair count, which can be orders of magnitude
    # larger on degenerate corpora)
    def explode_ids(b: pd.DataFrame) -> pd.DataFrame:
        ids = pd.concat([b.id_a, b.id_b], ignore_index=True).drop_duplicates()
        return pd.DataFrame(
            {
                "doc": ids,
                "__part": (
                    ids.to_numpy().astype(np.uint64) % np.uint64(num_parts)
                ).astype(np.int32),
            }
        )

    cand_docs = set(
        cand.map_batches(explode_ids, batch_format="pandas")
        .groupby("__part")
        .map_groups(lambda g: g[["doc"]].drop_duplicates(), batch_format="pandas")
        .to_pandas()["doc"]
    )

    if len(cand_docs) <= verify_broadcast_threshold:
        import ray

        docs_ref = ray.put(cand_docs)

        # ---- hash prefilter over ZERO-COPY numpy broadcasts.  A dict of
        # per-doc string frozensets is catastrophic to broadcast at scale:
        # every worker re-unpickles the whole heap once (measured ~100s
        # per worker at 200k docs / 19M shingles — the entire verify wall
        # time).  Instead the shingle sets ship as ONE sorted uint64 hash
        # array + offsets (plasma-zero-copy, microseconds to map) and the
        # per-pair count is a searchsorted merge.  Collisions can shift a
        # hash count by ±1 per colliding shingle (p ~ 1e-9 corpus-wide),
        # so the prefilter keeps a slack of 2 and the tiny survivor set is
        # re-verified EXACTLY on the string shingles — output equals the
        # all-strings computation with certainty, at numpy speed.
        def prune_hashes(b: pd.DataFrame) -> pd.DataFrame:
            # batch-vectorized md5: unique tokens hashed once (posting
            # lists repeat tokens heavily), per-doc sorted segments via
            # one lexsort — identical values to the old per-row _hash64
            # loop (md5vec is bit-identical), no per-group Python
            from .broadcast import cached_get
            from .md5vec import md5_u64

            keep = cached_get(docs_ref)
            d = b[b.doc.isin(keep)]
            if not len(d):
                return pd.DataFrame({"doc": [], "h": []})
            codes, uniq = pd.factorize(d["token"], sort=False)
            h = md5_u64(list(uniq))[codes]
            docs_np = d["doc"].to_numpy()
            order = np.lexsort((h, docs_np))
            docs_s, h_s = docs_np[order], h[order]
            bounds = np.flatnonzero(docs_s[1:] != docs_s[:-1]) + 1
            return pd.DataFrame(
                {"doc": docs_s[np.concatenate([[0], bounds])],
                 "h": np.split(h_s, bounds)}
            )

        hp = tok.map_batches(prune_hashes, batch_format="pandas").to_pandas()
        # a doc's shingles could span input blocks: merge + re-sort
        by_doc: dict = {}
        for doc, arr in zip(hp["doc"], hp["h"]):
            prev = by_doc.get(doc)
            by_doc[doc] = arr if prev is None else np.sort(np.concatenate([prev, arr]))
        docs_sorted = sorted(by_doc)
        lens = np.array([len(by_doc[d]) for d in docs_sorted], dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)])
        big = np.concatenate([by_doc[d] for d in docs_sorted]) if docs_sorted else np.array([], dtype=np.uint64)
        slot = {d: i for i, d in enumerate(docs_sorted)}
        big_ref, off_ref, slot_ref = ray.put(big), ray.put(offsets), ray.put(slot)

        def prefilter(b: pd.DataFrame) -> pd.DataFrame:
            from .broadcast import cached_get

            H = cached_get(big_ref)
            O = cached_get(off_ref)
            S = cached_get(slot_ref)
            rows = {"id_a": [], "id_b": []}
            for ia, ib in zip(b.id_a, b.id_b):
                sa, sb = S[ia], S[ib]
                a = H[O[sa] : O[sa + 1]]
                c = H[O[sb] : O[sb + 1]]
                if len(a) > len(c):
                    a, c = c, a
                idx = np.searchsorted(c, a)
                idx[idx == len(c)] = 0
                inter = int((c[idx] == a).sum())
                union = len(a) + len(c) - inter
                # slack 2 on both terms: survive unless hash counts say
                # the pair misses the threshold by MORE than collisions
                # could explain
                if (inter + 2) * threshold_den >= threshold_num * (union - 2):
                    rows["id_a"].append(ia)
                    rows["id_b"].append(ib)
            return pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in rows.items()}
            )

        survivors = cand.map_batches(
            prefilter, batch_format="pandas"
        ).to_pandas()
        if not len(survivors):
            return ray.data.from_pandas(
                pd.DataFrame(
                    {k: pd.Series([], dtype="int64")
                     for k in ("id_a", "id_b", "n_inter", "n_union")}
                )
            )
        # ---- exact second pass on the (output-adjacent) survivor set,
        # with STRING shingles for only the surviving docs
        sdocs = set(survivors.id_a) | set(survivors.id_b)
        sdocs_ref = ray.put(sdocs)

        def prune_strings(b: pd.DataFrame) -> pd.DataFrame:
            from .broadcast import cached_get

            keep = cached_get(sdocs_ref)
            d = b[b.doc.isin(keep)]
            agg = d.groupby("doc", sort=False)["token"].agg("\x1f".join)
            return pd.DataFrame({"doc": agg.index, "tokens": agg.to_numpy()})

        pruned = tok.map_batches(prune_strings, batch_format="pandas").to_pandas()
        merged = pruned.groupby("doc", sort=False)["tokens"].agg("\x1f".join)
        lookup = {d: frozenset(x.split("\x1f")) for d, x in merged.items()}
        out = _verify_rows(survivors, lookup)
        return ray.data.from_pandas(out.reset_index(drop=True))

    def collect_lists(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("doc", sort=False)["token"].agg("\x1f".join)
        return pd.DataFrame({"doc": agg.index, "tokens": agg.to_numpy()})

    doclists = (
        tok.map_batches(
            lambda b: b.assign(__part=hash_bucket(b.doc.to_numpy(), num_parts)),
            batch_format="pandas",
        )
        .groupby("__part")
        .map_groups(collect_lists, batch_format="pandas")
    )

    j1 = bucketed_hash_join(
        cand,
        doclists.map_batches(
            lambda b: b.rename(columns={"doc": "id_a", "tokens": "tokens_a"}),
            batch_format="pandas",
        ),
        "id_a",
    )
    j2 = bucketed_hash_join(
        j1,
        doclists.map_batches(
            lambda b: b.rename(columns={"doc": "id_b", "tokens": "tokens_b"}),
            batch_format="pandas",
        ),
        "id_b",
    )

    def verify_joined(b: pd.DataFrame) -> pd.DataFrame:
        # docs repeat across pairs in a batch — split each doc's list once
        cache: dict = {}

        def split_of(doc, joined):
            s = cache.get(doc)
            if s is None:
                s = cache[doc] = frozenset(joined.split("\x1f"))
            return s

        lookup = {
            ia: split_of(ia, ta) for ia, ta in zip(b.id_a, b.tokens_a)
        }
        lookup.update(
            (ib, split_of(ib, tb)) for ib, tb in zip(b.id_b, b.tokens_b)
        )
        return _verify_rows(b, lookup)

    return j2.map_batches(verify_joined, batch_format="pandas")
