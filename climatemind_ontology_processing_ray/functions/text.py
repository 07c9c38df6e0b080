"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All stages are ``map_batches`` transforms; the stateful ones (compiled
regexes, stopword sets, language profiles) are callable classes for actor
pools.  Hashing uses md5/crc — deterministic across processes (no
``hash()`` anywhere).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

_WORD_RE = re.compile(r"[A-Za-z0-9']+")
# BPE-ish token regex: words, numbers, or single non-space symbols
_BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been for on with as by at it this that".split()
)


def add_token_counts(ds: Dataset, text_col: str = "text") -> Dataset:
    """Append whitespace and BPE-ish token counts (vectorized per batch)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ws = [len(t.split(" ")) if t else 0 for t in texts]
        bpe = [len(_BPE_RE.findall(t)) if t else 0 for t in texts]
        batch = batch.append_column("n_tokens_ws", pa.array(ws, pa.int64()))
        batch = batch.append_column("n_tokens_bpe", pa.array(bpe, pa.int64()))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_ROLL_K = 1_000_003
_ROLL_MASK = (1 << 63) - 1


def roll_fingerprint(t: str) -> int:
    """Scalar 63-bit polynomial rolling hash of the word sequence (the
    reference semantics for ``fp_roll``; :func:`_roll_batch` is the
    vectorized twin, pytest-proven equal)."""
    h = 0
    for w in t.split():
        h = (h * _ROLL_K + int.from_bytes(
            hashlib.md5(w.encode()).digest()[:8], "little")) & _ROLL_MASK
    return h


def _roll_batch(texts: list) -> np.ndarray:
    """Vectorized ``roll_fingerprint`` over a batch.

    Tokenization stays Python ``str.split()`` (C-speed, exact semantics);
    the per-word md5 runs ONCE per unique word in the batch
    (``md5_u64_any``), and the order-sensitive polynomial fold becomes a
    closed form: h = (Σ w_i · K^(L-1-i)) mod 2^63.  Masking to 63 bits
    after every scalar step equals one final mask because 2^63 divides
    2^64 — uint64 wraparound arithmetic projects exactly onto mod 2^63."""
    from .md5vec import md5_u64_any

    words = [(t or "").split() for t in texts]
    lens = np.fromiter((len(w) for w in words), np.int64, len(words))
    out = np.zeros(len(words), np.int64)
    total = int(lens.sum())
    if total == 0:
        return out
    flat = [w for ws in words for w in ws]
    wh = md5_u64_any(flat)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    # exponent of K for flat position i in doc d: (end_d - 1 - i)
    exp = (np.repeat(offsets[1:], lens) - 1 - np.arange(total)).astype(np.int64)
    kmax = int(lens.max())
    powers = np.empty(kmax, np.uint64)
    powers[0] = 1
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        for j in range(1, kmax):  # kmax entries, not rows — tiny
            powers[j] = powers[j - 1] * np.uint64(_ROLL_K)
        contrib = wh * powers[exp]
    nonempty = lens > 0
    sums = np.add.reduceat(contrib, offsets[:-1][nonempty])
    out[nonempty] = (sums & np.uint64(_ROLL_MASK)).astype(np.int64)
    return out


def add_fingerprints(
    ds: Dataset, text_col: str = "text", with_roll: bool = True
) -> Dataset:
    """Append document fingerprints:

    - ``fp_md5``: md5 hex of the exact text (content-addressable id;
      DuckDB-checkable via ``md5(text)``)
    - ``fp_roll`` (``with_roll=True``): 63-bit polynomial rolling hash of
      the word sequence (order-sensitive; survives whitespace
      normalization).  Callers that only need the content id (e.g. bloom
      routing) pass ``with_roll=False`` and skip the word hashing."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        md5s = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
        batch = batch.append_column("fp_md5", pa.array(md5s, pa.string()))
        if with_roll:
            batch = batch.append_column(
                "fp_roll", pa.array(_roll_batch(texts), pa.int64())
            )
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
_PHONE_RE = re.compile(r"\+?\d[\d\- ]{7,}\d")


def scrub_pii(ds: Dataset, text_col: str = "text", out_col: str | None = None) -> Dataset:
    """Replace email addresses and phone-number-shaped digit runs with
    placeholder tokens (the standard pre-training PII scrub; stateless
    vectorized map)."""
    out_col = out_col or text_col

    def fn(batch: pa.Table) -> pa.Table:
        scrubbed = [
            _PHONE_RE.sub("<PHONE>", _EMAIL_RE.sub("<EMAIL>", t or ""))
            for t in batch.column(text_col).to_pylist()
        ]
        arr = pa.array(scrubbed, pa.string())
        if out_col in batch.column_names:
            batch = batch.drop_columns([out_col])
        return batch.append_column(out_col, arr)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def pack_documents(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 2048,
    num_bins: int = 64,
) -> Dataset:
    """Pack documents into fixed-token-budget training groups.

    Docs are hash-partitioned into ``num_bins`` groups (one shuffle), then
    greedily packed in deterministic (id) order inside each group.  Over-
    budget single documents become singleton packs.  Output: pack_id
    (string: "<bin>-<seq>"), doc_ids (list), n_tokens (int64).
    """
    def add_bin(batch: pa.Table) -> pa.Table:
        from .md5vec import md5_hex8_u64

        if batch.num_rows == 0:
            return batch.append_column("__bin", pa.array([], pa.int32()))
        bins = (md5_hex8_u64(batch.column(id_col)) % np.uint64(num_bins)).astype(
            np.int32
        )
        return batch.append_column("__bin", pa.array(bins, pa.int32()))

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        bin_id = int(g["__bin"].iloc[0])
        packs, ids, toks = [], [], 0
        out_rows = []
        for i, t in zip(g[id_col], g[text_col]):
            n = len((t or "").split(" "))
            if ids and toks + n > max_tokens:
                out_rows.append((ids, toks))
                ids, toks = [], 0
            ids.append(i)
            toks += n
        if ids:
            out_rows.append((ids, toks))
        return pd.DataFrame(
            {
                "pack_id": [f"{bin_id}-{seq}" for seq in range(len(out_rows))],
                "doc_ids": [r[0] for r in out_rows],
                "n_tokens": [int(r[1]) for r in out_rows],
            }
        )

    return (
        ds.map_batches(add_bin, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bin")
        .map_groups(pack, batch_format="pandas")
    )


class TextQualityScorer:
    """Actor-pool quality scorer: length / punctuation / stopword /
    uniqueness signals (the usual pre-training quality heuristics)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = _WORD_RE

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].fillna("")
        n_chars = texts.str.len()
        words = [self.word_re.findall(t.lower()) for t in texts]
        n_words = np.array([len(w) for w in words], dtype=np.int64)
        n_uniq = np.array([len(set(w)) for w in words], dtype=np.int64)
        n_stop = np.array(
            [sum(1 for x in w if x in _STOPWORDS) for w in words], dtype=np.int64
        )
        alpha = np.array([sum(c.isalpha() for c in t) for t in texts], dtype=np.int64)
        safe_words = np.maximum(n_words, 1)
        batch = batch.copy()
        batch["n_words"] = n_words
        # integer signal counts (exact-arithmetic surrogates for the float
        # ratios below: SQL-reproducible without FP drift)
        batch["n_chars"] = n_chars.to_numpy().astype(np.int64)
        batch["n_uniq_words"] = n_uniq
        batch["n_stop_words"] = n_stop
        batch["n_alpha_chars"] = alpha
        batch["uniq_ratio"] = n_uniq / safe_words
        batch["stop_ratio"] = n_stop / safe_words
        batch["alpha_ratio"] = alpha / np.maximum(n_chars.to_numpy(), 1)
        batch["mean_word_len"] = np.where(
            n_words > 0,
            np.array([sum(len(x) for x in w) for w in words]) / safe_words,
            0.0,
        )
        # composite quality in [0,1]: stopword presence, lexical diversity,
        # alphabetic density
        batch["quality"] = (
            0.4 * np.clip(batch["stop_ratio"] * 4, 0, 1)
            + 0.3 * batch["uniq_ratio"]
            + 0.3 * batch["alpha_ratio"]
        )
        return batch


class LangIdScorer:
    """Character-trigram language ID (n-gram heuristic).

    Profiles are tiny hand-rolled trigram sets for a few European
    languages; scores are Jaccard-style overlaps.  Built once per actor.
    For real pipelines swap in a fastText model in ``__init__`` — the Ray
    plumbing (actor pool, batch scoring) is identical.
    """

    PROFILES = {
        "en": ("the", " th", "he ", "ing", "ion", "and", " an", "ed ", " of", "of "),
        "de": ("der", "die", "und", "ein", "ich", "sch", "cht", " de", "en ", "ung"),
        "fr": ("le ", " de", "es ", "ent", "que", " qu", "ion", " le", "ais", "une"),
        "es": ("de ", " de", "la ", " la", "ión", "que", " qu", "os ", "ado", " es"),
    }

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.profiles = {k: frozenset(v) for k, v in self.PROFILES.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds, scores = [], []
        for t in batch[self.text_col].fillna(""):
            low = t.lower()[:2000]
            grams = {low[i : i + 3] for i in range(max(0, len(low) - 2))}
            best_lang, best = "unknown", 0.0
            for lang, prof in self.profiles.items():
                s = len(grams & prof) / len(prof)
                if s > best:
                    best_lang, best = lang, s
            preds.append(best_lang if best >= 0.2 else "unknown")
            scores.append(best)
        batch = batch.copy()
        batch["lang_pred"] = preds
        batch["lang_score"] = np.array(scores, dtype=np.float32)
        return batch


def inverted_index(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_range: int | None = None,
) -> Dataset:
    """Build an inverted index: token -> (document frequency, posting
    list).  Per-batch explode to DISTINCT (token, doc) pairs (map-side
    dedup — a token repeated within a doc contributes once), then ONE
    groupby that materializes each posting list sorted by doc id.

    Postings are emitted as a comma-joined string (deterministic,
    hash-comparable).

    ``shard_range`` is the SKEW control for web scale, where a
    stop-token's posting list is corpus-sized: rows are keyed by
    ``(token, doc_id // shard_range)`` — the shard id is assigned at MAP
    time (before any exchange), so a hot token's pairs spread over
    ceil(id_space / shard_range) reducers and no single task ever holds
    a full hot posting list.  Output gains a ``shard`` column; readers
    re-concatenate shards in shard order (doc-id ranges are disjoint and
    ordered).  With ``shard_range=None`` each token is one row (fine for
    bounded vocabularies / partitioned id spaces)."""
    import pandas as pd

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        toks, ids = [], []
        for i, txt in zip(b[id_col], b[text_col]):
            for t in set((txt or "").lower().split(" ")):
                if t:
                    toks.append(t)
                    ids.append(int(i))
        out = pd.DataFrame({"token": toks, id_col: ids}).drop_duplicates()
        if shard_range:
            out["shard"] = (out[id_col] // shard_range).astype("int64")
        # coarse partition (exact_dedup pattern): one ray group per
        # partition id, vectorized per-key work inside — avoids ray's
        # per-group scheduling cost at vocabulary-sized key counts
        from .join import hash_bucket

        key = out["token"] if not shard_range else (
            out["token"] + "\x00" + out["shard"].astype(str)
        )
        out["__part"] = hash_bucket(key.to_numpy(), 64)
        return out

    group_keys = ["token", "shard"] if shard_range else ["token"]

    def postings(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for key, grp in g.groupby(group_keys, sort=False):
            if not isinstance(key, tuple):
                key = (key,)
            ids = sorted(set(grp[id_col]))
            row = {
                "token": key[0],
                "df": len(ids),
                "postings": ",".join(str(i) for i in ids),
            }
            if shard_range:
                row["shard"] = int(key[1])
            out.append(row)
        return pd.DataFrame(out)

    return (
        ds.map_batches(explode, batch_format="pandas")
        .groupby("__part")
        .map_groups(postings, batch_format="pandas")
    )


# --------------------------------------------------------------------- #
# URL canonicalization
# --------------------------------------------------------------------- #

_URL_PARTS_RE = re.compile(
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<host>[^/?#]*)"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$"
)
_DEFAULT_PORT = {"http": ":80", "https": ":443"}
_TRACKING_PREFIX = "utm_"


def canonicalize_url(url: str) -> str | None:
    """One canonical form per logical resource: lowercase scheme+host,
    strip the scheme's default port, strip the fragment, drop ``utm_*``
    tracking params, sort the remaining query params (codepoint order,
    matching DuckDB LIST_SORT on VARCHAR), strip the path's trailing
    slashes ('' → '/').  Returns None for non-URL strings (caller
    decides whether to keep them verbatim or drop them)."""
    m = _URL_PARTS_RE.match(url)
    if m is None:
        return None
    scheme = m.group("scheme").lower()
    host = m.group("host").lower()
    default = _DEFAULT_PORT.get(scheme)
    if default and host.endswith(default):
        host = host[: -len(default)]
    path = (m.group("path") or "").rstrip("/") or "/"
    query = m.group("query")
    canon = f"{scheme}://{host}{path}"
    if query:
        params = sorted(
            p for p in query.split("&") if p and not p.startswith(_TRACKING_PREFIX)
        )
        if params:
            canon += "?" + "&".join(params)
    return canon


def add_canonical_url(ds, url_col: str = "url", out_col: str = "canonical_url"):
    """Append the canonical form of ``url_col``.  Per-row regex + string
    ops (bounded by URL length, no corpus-sized state); at 100 TB this
    stage is embarrassingly parallel and CPU-cheap relative to text
    transforms — vectorizing the common no-query fast path via pyarrow
    string kernels is possible but was not the bottleneck at bench scale."""

    def fn(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        canon = [canonicalize_url(u) if u is not None else None for u in urls]
        return batch.append_column(out_col, pa.array(canon, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def prefix_blocklist_filter(
    ds: Dataset, prefixes: list[str], url_col: str = "url"
) -> Dataset:
    """Crawl-policy URL filtering: drop rows whose url starts with any
    blocklist prefix (robots/spam/ads host and path rules — the
    URL-level removal step every Common-Crawl curation pipeline runs
    before content filters).

    Rule sets are policy-sized (thousands, not corpus-sized), so they ride
    in the task closure and each rule is ONE vectorized pyarrow
    ``starts_with`` pass over the batch — no shuffle, no per-row Python.
    (A million-rule list would swap the loop for a sorted-prefix
    searchsorted bound per batch; the streaming-filter shape is the same.)
    """
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        col = batch.column(url_col)
        blocked = pa.array(np.zeros(batch.num_rows, dtype=bool))
        for p in prefixes:
            blocked = pc.or_kleene(blocked, pc.starts_with(col, pattern=p))
        return batch.filter(pc.invert(pc.fill_null(blocked, False)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------- #
# normalization + chunking
# --------------------------------------------------------------------- #

# explicit ASCII classes so Python re and RE2-style SQL regexps agree
# (Python \s is unicode-aware; DuckDB's is not)
_CTRL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")
_WS_RUN_RE = re.compile(r"[ \t\n\r\f]+")


def normalize_text(ds, text_col: str = "text", out_col: str = "norm_text"):
    """Standard pre-tokenization cleanup: strip ASCII control chars,
    collapse whitespace runs to single spaces, trim.  Stateless
    vectorized map; mirrors REGEXP_REPLACE SQL exactly."""

    def fn(batch: pa.Table) -> pa.Table:
        out = [
            _WS_RUN_RE.sub(" ", _CTRL_RE.sub("", t or "")).strip()
            for t in batch.column(text_col).to_pylist()
        ]
        return batch.append_column(out_col, pa.array(out, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def chunk_documents(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 50,
    overlap: int = 10,
):
    """Split documents into overlapping fixed-size word windows (training
    context-window chunking).  Flat-map shape: each input row expands to
    ``max(1, ceil((L - chunk_words)/stride) + 1)`` rows with columns
    (id, chunk_id, chunk_text, n_words).  Pure per-row expansion — no
    shuffle, output block sizes stay bounded because map_batches splits
    oversized outputs."""
    if overlap >= chunk_words:
        raise ValueError("overlap must be < chunk_words")
    stride = chunk_words - overlap

    def fn(batch: pa.Table) -> pa.Table:
        ids, cids, texts, nw = [], [], [], []
        for i, t in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            w = (t or "").split(" ")
            L = len(w)
            n = 1 if L <= chunk_words else -(-(L - chunk_words) // stride) + 1
            for c in range(n):
                piece = w[c * stride : c * stride + chunk_words]
                ids.append(i)
                cids.append(c)
                texts.append(" ".join(piece))
                nw.append(len(piece))
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "chunk_id": pa.array(cids, pa.int64()),
                "chunk_text": pa.array(texts, pa.string()),
                "n_words": pa.array(nw, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def build_vocab(ds: Dataset, text_col: str, size: int) -> list[str]:
    """Global top-``size`` terms by frequency (ties broken
    lexicographically): per-batch explode+count, scale-safe
    :func:`~..functions.agg.grouped_sum` over terms, then each partition
    ships only its LOCAL top-``size`` candidates to the driver (<= size
    rows per partition — the global top-k must be among them), where the
    final merge runs on a candidates-sized frame."""
    from .agg import grouped_sum

    def explode_count(b: pd.DataFrame) -> pd.DataFrame:
        counts: dict[str, int] = {}
        for t in b[text_col]:
            for w in (t or "").lower().split(" "):
                if w:
                    counts[w] = counts.get(w, 0) + 1
        return pd.DataFrame({"term": list(counts), "n": list(counts.values())})

    grouped = grouped_sum(
        ds.map_batches(explode_count, batch_format="pandas"), ["term"], ["n"]
    )

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["n", "term"], ascending=[False, True]).head(size)

    cand = grouped.map_batches(local_topk, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["n", "term"], ascending=[False, True]).head(size)
    return cand["term"].tolist()


def oov_stats(
    ds: Dataset, vocab: list[str], text_col: str = "text"
) -> Dataset:
    """Per-document token/OOV counts against a broadcast vocabulary
    (exact integers — no float coverage ratio crosses the compare
    boundary).  The vocab set ships once via ``ray.put``; each batch does
    a vectorized set-membership pass."""
    import ray

    ref = ray.put(frozenset(vocab))

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        vs = ray.get(ref)
        n_tok, n_oov = [], []
        for t in b[text_col]:
            words = [w for w in (t or "").lower().split(" ") if w]
            n_tok.append(len(words))
            n_oov.append(sum(1 for w in words if w not in vs))
        b = b.copy()
        b["n_tokens"] = np.asarray(n_tok, dtype=np.int64)
        b["n_oov"] = np.asarray(n_oov, dtype=np.int64)
        return b

    return ds.map_batches(fn, batch_format="pandas")


def rarity_score(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_parts: int | None = None,
) -> Dataset:
    """CCNet-style n-gram language-model quality surrogate: per-document
    bigram "rarity" — the corpus-integer analogue of perplexity-based
    head/middle/tail bucketing (CCNet trains a 5-gram KenLM; the
    distributed SHAPE here is identical, the score swaps ``-log p`` for
    the exact-integer surprise ``TOTAL // count(gram)`` so no float log
    ever crosses a partition or engine boundary).

    score(doc) = sum over the doc's bigram OCCURRENCES of
    ``TOTAL // cnt(gram)`` where ``cnt`` is the corpus-wide occurrence
    count and ``TOTAL = sum of all bigram occurrences``.  Rare grams
    score high; boilerplate scores low.  Docs with < 2 whitespace tokens
    are excluded (no bigram).

    Shuffle structure (scales to open vocabularies — no broadcast):

    1. streaming scalar pre-pass for TOTAL (two ints per block);
    2. per-batch (doc, gram, m) occurrence partials, ONE hash(gram)
       exchange — every occurrence of a gram co-locates, so the global
       count AND each doc's contribution compute inside the partition;
    3. one ``grouped_sum`` on doc id for the per-doc total.

    Output: (id_col, rarity int64).
    """
    from .agg import grouped_sum
    from .join import hash_bucket

    if num_parts is None:
        from .partitioning import adaptive_parts

        num_parts = adaptive_parts(ds)

    def _grams(b: pd.DataFrame) -> pd.DataFrame:
        # tokens = LOWER(text) split on single spaces, EMPTIES KEPT —
        # mirrors SQL STRING_SPLIT exactly
        toks = b[text_col].fillna("").str.lower().str.split(" ")
        n_tok = toks.str.len().to_numpy(dtype=np.int64)
        n_gram = np.maximum(n_tok - 1, 0)
        total = int(n_gram.sum())
        if total == 0:
            return pd.DataFrame({id_col: [], "gram": [], "m": []})
        flat = toks.explode().to_numpy(dtype=object)
        starts = np.cumsum(n_tok) - n_tok
        offs = np.arange(total) - np.repeat(np.cumsum(n_gram) - n_gram, n_gram)
        idx = offs + np.repeat(starts, n_gram)
        left = pd.Series(flat[idx], dtype=object)
        right = pd.Series(flat[idx + 1], dtype=object)
        ids = np.repeat(b[id_col].to_numpy(), n_gram)
        occ = pd.DataFrame({id_col: ids, "gram": left + " " + right})
        out = occ.groupby([id_col, "gram"], sort=False).size().reset_index(name="m")
        out["m"] = out["m"].astype("int64")
        return out

    def total_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].fillna("").str.lower().str.split(" ")
        n = np.maximum(toks.str.len().to_numpy(dtype=np.int64) - 1, 0)
        return pd.DataFrame({"t_p": [int(n.sum())]})

    total = int(
        ds.map_batches(total_partial, batch_format="pandas").sum("t_p")
    )

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        out = _grams(b)
        out["__part"] = hash_bucket(out["gram"].to_numpy(), num_parts)
        return out

    def score_partition(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby("gram", sort=False)["m"].transform("sum").to_numpy()
        contrib = g["m"].to_numpy() * (total // cnt)
        part = pd.DataFrame({id_col: g[id_col].to_numpy(), "rarity": contrib})
        out = part.groupby(id_col, sort=False)["rarity"].sum().reset_index()
        out["rarity"] = out["rarity"].astype("int64")
        return out

    partials = (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(score_partition, batch_format="pandas")
    )
    return grouped_sum(partials, [id_col], ["rarity"])


def bpe_pair_counts(
    ds: Dataset,
    text_col: str = "text",
    top_k: int = 50,
    num_parts: int | None = None,
) -> Dataset:
    """The BPE tokenizer-training inner loop: corpus-wide adjacent
    token-pair frequencies, top-``top_k`` by count (the pair a BPE/WordPiece
    trainer would merge next — run iteratively with a merge applied between
    rounds to train a full vocab; one round is the distributed primitive).

    Tokenization mirrors :func:`rarity_score` (LOWER + split on single
    spaces, empties kept — SQL ``STRING_SPLIT`` parity).

    Shuffle structure: per-batch pair counting is ONE vectorized
    explode+groupby (map-side combine — the exchange carries
    (lhs, rhs, partial count) rows, never raw token streams), then a single
    ``grouped_sum`` hash exchange.  After the sum each pair lives in exactly
    one block, so a per-block top-k prefilter bounds what reaches the driver
    at k x num_blocks rows regardless of vocabulary size.

    Output: (lhs, rhs, cnt) — NOT yet globally ranked; callers take the
    final top-k on the (small) prefiltered result.
    """
    from .agg import grouped_sum

    if num_parts is None:
        from .partitioning import adaptive_parts

        num_parts = adaptive_parts(ds)

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].fillna("").str.lower().str.split(" ")
        n_tok = toks.str.len().to_numpy(dtype=np.int64)
        n_gram = np.maximum(n_tok - 1, 0)
        total = int(n_gram.sum())
        if total == 0:
            return pd.DataFrame(
                {
                    "lhs": pd.Series([], dtype=object),
                    "rhs": pd.Series([], dtype=object),
                    "cnt": pd.Series([], dtype="int64"),
                }
            )
        flat = toks.explode().to_numpy(dtype=object)
        starts = np.cumsum(n_tok) - n_tok
        offs = np.arange(total) - np.repeat(np.cumsum(n_gram) - n_gram, n_gram)
        idx = offs + np.repeat(starts, n_gram)
        occ = pd.DataFrame({"lhs": flat[idx], "rhs": flat[idx + 1]})
        out = occ.groupby(["lhs", "rhs"], sort=False).size().reset_index(name="cnt")
        out["cnt"] = out["cnt"].astype("int64")
        return out

    summed = grouped_sum(
        ds.map_batches(pairs, batch_format="pandas"), ["lhs", "rhs"], ["cnt"], num_parts
    )

    def block_topk(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b
        return b.sort_values(
            ["cnt", "lhs", "rhs"], ascending=[False, True, True], kind="mergesort"
        ).head(top_k)

    return summed.map_batches(block_topk, batch_format="pandas")


def cooccurrence_pmi(
    mentions,
    n_docs: int,
    id_col: str = "doc_id",
    term_col: str = "term",
    scale: int = 10**6,
    num_parts: int = 64,
):
    """Pointwise-mutual-information association scores for term pairs
    co-occurring in a document — the corpus-statistics step behind
    relation candidates ("X and Y keep appearing together") in a KG
    pipeline.

    Integer-scaled: pmi_scaled = (N * c_ab * scale) // (c_a * c_b) — the
    monotone core of PMI = log(N*c_ab/(c_a*c_b)) without the float log,
    so rankings are bit-exact across partitionings and in SQL.

    Shuffle structure: one coarse hash(doc) partition groups a doc's
    mentions for pair expansion (per-doc pair count is vocab-bounded —
    the mention stage's contract); pair counts and term counts are each
    one grouped_sum; the term-count table (vocab-sized by construction)
    broadcasts via ``ray.put`` for the final map — no join shuffle.

    Output: (term_a, term_b, n_ab, pmi_scaled), term_a < term_b.
    """
    from itertools import combinations

    import ray

    from .agg import grouped_sum
    from .join import hash_bucket

    def dedup_tag(b: pd.DataFrame) -> pd.DataFrame:
        d = b[[id_col, term_col]].drop_duplicates()
        return d.assign(__part=hash_bucket(d[id_col].to_numpy(), num_parts))

    tagged = mentions.map_batches(dedup_tag, batch_format="pandas")

    def doc_pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g[[id_col, term_col]].drop_duplicates()
        ta, tb = [], []
        for _, grp in d.groupby(id_col, sort=False):
            for x, y in combinations(sorted(grp[term_col]), 2):
                ta.append(x)
                tb.append(y)
        out = pd.DataFrame({"term_a": ta, "term_b": tb})
        vc = out.value_counts()
        return pd.DataFrame(
            {
                "term_a": [k[0] for k in vc.index],
                "term_b": [k[1] for k in vc.index],
                "n_ab": vc.to_numpy().astype("int64"),
            }
        )

    pair_counts = grouped_sum(
        tagged.groupby("__part").map_groups(doc_pairs, batch_format="pandas"),
        ["term_a", "term_b"],
        ["n_ab"],
    )

    # term counts run through the SAME doc-partitioned groupby, where a
    # doc's rows are co-located, so (doc, term) pairs split across input
    # batches still dedup exactly before counting
    def term_partial(g: pd.DataFrame) -> pd.DataFrame:
        vc = g[[id_col, term_col]].drop_duplicates()[term_col].value_counts()
        return pd.DataFrame(
            {term_col: vc.index, "c": vc.to_numpy().astype("int64")}
        )

    tc = grouped_sum(
        tagged.groupby("__part").map_groups(term_partial, batch_format="pandas"),
        [term_col],
        ["c"],
    ).to_pandas()
    tc_ref = ray.put(dict(zip(tc[term_col], tc["c"].astype(int))))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        counts = ray.get(tc_ref)
        pmi = [
            (n_docs * int(nab) * scale) // (counts[a] * counts[bb])
            for a, bb, nab in zip(b.term_a, b.term_b, b.n_ab)
        ]
        return b.assign(pmi_scaled=pd.Series(pmi, dtype="int64", index=b.index))

    return pair_counts.map_batches(score, batch_format="pandas")


def readability_components(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Flesch reading-ease as an EXACT integer rational per document —
    the readability leg of a quality-filtering stack (alongside
    :class:`QualityScorer`'s length/punct/stopword features).

    Components (all RE2 counts, vectorized via
    ``pyarrow.compute.count_substring_regex`` — zero-copy Arrow, no
    exchange; a document is one row):

    - ``words``      = matches of ``[^ ]+``   (space-delimited tokens)
    - ``sentences``  = matches of ``[.!?]+``  (terminator runs)
    - ``vowel_groups`` = matches of ``[aeiouAEIOU]+`` (the classic
      syllable proxy: one syllable per vowel run)

    Flesch = 206.835 - 1.015*(W/S) - 84.6*(V/W).  With S,W clamped to
    >= 1 and everything scaled by 1000*S*W the score is the exact
    rational ``flesch_num / flesch_den`` where::

        flesch_num = 206835*S*W - 1015*W*W - 84600*V*S
        flesch_den = 1000*S*W

    No float ever crosses the engine/oracle boundary; magnitudes stay
    < 2^63 for documents up to ~10^6 tokens.  Output columns:
    (id_col, words, sentences, vowel_groups, flesch_num, flesch_den).
    """

    def fn(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(b[text_col], pa.string()), "")
        w = pc.count_substring_regex(txt, "[^ ]+").to_numpy().astype(np.int64)
        s = pc.count_substring_regex(txt, "[.!?]+").to_numpy().astype(np.int64)
        v = (
            pc.count_substring_regex(txt, "[aeiouAEIOU]+")
            .to_numpy()
            .astype(np.int64)
        )
        wc = np.maximum(w, 1)
        sc = np.maximum(s, 1)
        num = 206835 * sc * wc - 1015 * wc * wc - 84600 * v * sc
        den = 1000 * sc * wc
        return pa.table(
            {
                id_col: b[id_col],
                "words": pa.array(w),
                "sentences": pa.array(s),
                "vowel_groups": pa.array(v),
                "flesch_num": pa.array(num),
                "flesch_den": pa.array(den),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def doc_keywords(
    ds: Dataset,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_parts: int | None = None,
) -> Dataset:
    """Per-document keyword extraction: the top-``k`` tokens ranked by
    (tf DESC, df ASC, token ASC) — term frequency first, corpus rarity
    as the tiebreak.  The deterministic integer core of tf-idf keyword
    tagging (no log/float ranks, so results hash-compare exactly).

    Tokens = LOWER(text) split on single spaces, empties dropped.

    Shuffle structure (open-vocabulary safe — document frequency is
    never broadcast):

    1. per-batch (doc, token, tf) partials — tf is already global
       because a document is one row;
    2. ONE hash(token) exchange: every (doc, token) row of a token
       co-locates, so df = group size attaches in-partition;
    3. ONE hash(doc) exchange: per-doc sort + head(k) in-partition.

    Output: (id_col, kw_rank, token, tf, df).
    """
    from .join import hash_bucket
    from .partitioning import adaptive_parts

    if num_parts is None:
        num_parts = adaptive_parts(ds)

    def tf_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].fillna("").str.lower().str.split(" ")
        n = toks.str.len().to_numpy(dtype=np.int64)
        ids = np.repeat(b[id_col].to_numpy(), n)
        flat = toks.explode().to_numpy(dtype=object)
        df = pd.DataFrame({id_col: ids, "token": flat})
        df = df[df["token"] != ""]
        out = df.groupby([id_col, "token"], sort=False).size().reset_index(name="tf")
        out["tf"] = out["tf"].astype("int64")
        out["__part"] = hash_bucket(out["token"].to_numpy(), num_parts)
        return out

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("token", sort=False)["tf"].transform("size").to_numpy()
        out = g[[id_col, "token", "tf"]].copy()
        out["df"] = d.astype("int64")
        out["__dpart"] = hash_bucket(out[id_col].to_numpy(), num_parts)
        return out

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [id_col, "tf", "df", "token"],
            ascending=[True, False, True, True],
            kind="mergesort",
        )
        g = g.groupby(id_col, sort=False).head(k).copy()
        g["kw_rank"] = g.groupby(id_col, sort=False).cumcount() + 1
        g["kw_rank"] = g["kw_rank"].astype("int64")
        return g[[id_col, "kw_rank", "token", "tf", "df"]]

    return (
        ds.map_batches(tf_partial, batch_format="pandas")
        .groupby("__part")
        .map_groups(attach_df, batch_format="pandas")
        .groupby("__dpart")
        .map_groups(topk, batch_format="pandas")
    )
