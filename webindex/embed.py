"""Dense-retrieval parity path: embedding stage + pooling reductions.

Ray-Data re-expression of the reference's bi-encoder pipeline
(/root/reference/biencoder/beir/beir_dense_retriever.py — SURVEY.md §3.2)
with the GPU model swapped for a deterministic hashed-token embedder, so the
*engine semantics* (tokenize → truncate → per-token vectors → pooling →
chunked top-k with merge) are real and testable without model weights:

- token vector = unit vector seeded by blake2b(token) — stable across
  processes, platforms, and parallelism;
- truncation to ``max_tokens`` with truncation counters
  (M5/A3, beir_dense_retriever.py:128-137,160-179);
- optional left-truncation keeping the tail (M9, sgptce.py:199-205);
- specb role wrapping: queries get ``[`` ``]`` marker tokens, docs ``{`` ``}``
  (M6, beir_dense_retriever.py:100-104,148-153);
- pooling: ``mean`` | ``weightedmean`` (position weights 1..L) | ``lasttoken``
  (A1, beir_dense_retriever.py:237-305, models/Pooling.py:102-164).

``EmbedStage`` is an actor-pool ``map_batches`` class: vocabulary vector
cache builds up per actor (the CustomEmbedder-ctor analog). ``dense_retrieve``
composes it with ``ann.brute_topk`` (K1 chunked top-k + merge).
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np
import pyarrow as pa

from webindex.analyze import Analyzer
from webindex.config import SQL_SAFE_ANALYZER

POOLINGS = (
    "mean", "weightedmean", "lasttoken",
    "meanmean", "lasttokenmean", "poolout", "weightedmean_learnt",
)
# poolings that reduce over all hidden layers, not just the last
_LAYERED = {"meanmean", "lasttokenmean"}


def token_vector(token: str, dim: int) -> np.ndarray:
    """Deterministic unit vector for a token (no RNG state dependence)."""
    seed = int.from_bytes(
        blake2b(token.encode("utf-8"), digest_size=8).digest(), "big"
    )
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    n = np.linalg.norm(v)
    return v / n if n else v


def token_vector_poly(token: str, dim: int) -> np.ndarray:
    """SQL-expressible unit vector: component j is the polynomial hash of
    ``token + chr(31) + str(j)`` mapped to [-0.5, 0.5), then normalized —
    every step reproducible in DuckDB (HUGEINT list_reduce + doubles), so
    the full dense pipeline gets a SQL oracle (contract entry
    dense_top5_poly)."""
    from webindex.dedup import _MERSENNE, _poly_hash

    v = np.fromiter(
        (_poly_hash(f"{token}\x1f{j}") for j in range(dim)),
        dtype=np.float64, count=dim,
    )
    v = v / _MERSENNE - 0.5
    n = np.linalg.norm(v)
    return v / n if n else v


def pool(mat: np.ndarray, method: str, *, layer_mats: np.ndarray = None,
         position_weights: np.ndarray = None) -> np.ndarray:
    """Per-document reduction over the (L, d) token matrix (A1,
    beir_dense_retriever.py:237-305):

    - ``mean`` / ``weightedmean`` (position weights 1..L) / ``lasttoken``
      reduce the last hidden layer;
    - ``meanmean`` averages over ALL layers and tokens, ``lasttokenmean``
      averages the last token's vector across layers (``layer_mats``:
      (n_layers, L, d), layer -1 == ``mat``);
    - ``poolout`` is the pooler-head analog: tanh of the first token's
      vector (BERT pooler = dense+tanh over CLS; the dense projection is
      identity in this model-free stand-in);
    - ``weightedmean_learnt`` uses externally supplied per-position
      weights with the reference's 1e-9 clamp
      (models/WeightedMeanPooling.py:21-38).
    """
    if mat.shape[0] == 0:
        return np.zeros(mat.shape[1], dtype=np.float64)
    if method == "mean":
        return mat.mean(axis=0)
    if method == "weightedmean":
        w = np.arange(1, mat.shape[0] + 1, dtype=np.float64)
        return (mat * w[:, None]).sum(axis=0) / w.sum()
    if method == "lasttoken":
        return mat[-1]
    if method == "meanmean":
        return layer_mats.mean(axis=(0, 1))
    if method == "lasttokenmean":
        return layer_mats[:, -1, :].mean(axis=0)
    if method == "poolout":
        return np.tanh(mat[0])
    if method == "weightedmean_learnt":
        w = np.asarray(position_weights, dtype=np.float64)[: mat.shape[0]]
        return (mat * w[:, None]).sum(axis=0) / max(float(w.sum()), 1e-9)
    raise ValueError(f"unknown pooling {method!r}")


class EmbedStage:
    """map_batches actor stage: (id, text) -> (id, embedding, n_tokens,
    truncated).

    ``role``: ``"doc"`` | ``"query"`` — selects specb wrapping markers;
    ``None`` disables wrapping.
    """

    def __init__(self, dim: int = 64, pooling: str = "mean",
                 max_tokens: int = 256, truncate_side: str = "right",
                 role: str | None = None, analyzer_cfg=None,
                 id_col: str = "doc_id", text_col: str = "text",
                 n_layers: int = 3, position_weights=None,
                 vec_source: str = "blake2b"):
        assert pooling in POOLINGS
        assert truncate_side in ("right", "left")
        assert vec_source in ("blake2b", "poly")
        # "poly" = SQL-parity variant: poly-hash token vectors AND float64
        # output embeddings (the default float32 cast would put the values
        # outside what a float64 SQL oracle can reproduce to 6dp)
        self.vec_source = vec_source
        self.an = Analyzer(analyzer_cfg or SQL_SAFE_ANALYZER)
        self.dim = dim
        self.pooling = pooling
        self.max_tokens = max_tokens
        self.truncate_side = truncate_side
        self.id_col = id_col
        self.text_col = text_col
        # layered poolings reduce over n_layers "hidden states"; layer
        # n_layers-1 is the base token vector (the last hidden layer)
        self.n_layers = n_layers if pooling in _LAYERED else 1
        if position_weights is None and pooling == "weightedmean_learnt":
            # untrained default = all-ones (WeightedMeanPooling.py:19)
            position_weights = np.ones(max_tokens + 2, dtype=np.float64)
        self.position_weights = position_weights
        if role == "query":
            self.wrap = ("[", "]")
        elif role == "doc":
            self.wrap = ("{", "}")
        else:
            self.wrap = None
        self._vocab: dict[tuple[int, str], np.ndarray] = {}

    def _vec(self, tok: str, layer: int = -1) -> np.ndarray:
        if layer < 0:
            layer = self.n_layers - 1
        key = (layer, tok)
        v = self._vocab.get(key)
        if v is None:
            name = tok if layer == self.n_layers - 1 else f"L{layer}\x00{tok}"
            fn = token_vector_poly if self.vec_source == "poly" else token_vector
            v = self._vocab[key] = fn(name, self.dim)
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        out, n_toks, truncated = [], [], []
        for text in batch.column(self.text_col).to_pylist():
            toks = self.an.tokens(text or "")
            if self.wrap:
                toks = [self.wrap[0]] + toks + [self.wrap[1]]
            trunc = len(toks) > self.max_tokens
            if trunc:
                toks = (
                    toks[: self.max_tokens]
                    if self.truncate_side == "right"
                    else toks[-self.max_tokens:]  # M9 keep-the-tail
                )
            mat = (
                np.stack([self._vec(t) for t in toks])
                if toks
                else np.zeros((0, self.dim))
            )
            layer_mats = None
            if self.pooling in _LAYERED and toks:
                layer_mats = np.stack(
                    [
                        np.stack([self._vec(t, layer) for t in toks])
                        for layer in range(self.n_layers)
                    ]
                )
            pooled = pool(
                mat, self.pooling, layer_mats=layer_mats,
                position_weights=self.position_weights,
            )
            out.append(
                pooled if self.vec_source == "poly"
                else pooled.astype(np.float32)
            )
            n_toks.append(len(toks))
            truncated.append(trunc)
        emb_type = (
            pa.float64() if self.vec_source == "poly" else pa.float32()
        )
        return pa.table(
            {
                self.id_col: ids,
                "embedding": pa.array(
                    [v.tolist() for v in out], pa.list_(emb_type)
                ),
                "n_tokens": pa.array(n_toks, pa.int32()),
                "truncated": pa.array(truncated, pa.bool_()),
            }
        )


def embed_texts(texts: list[str], **kw) -> np.ndarray:
    """Driver-side helper (small inputs: the query set)."""
    stage = EmbedStage(**kw)
    tab = pa.table(
        {kw.get("id_col", "doc_id"): pa.array(range(len(texts)), pa.int64()),
         kw.get("text_col", "text"): pa.array(texts)}
    )
    out = stage(tab)
    return np.array(out.column("embedding").to_pylist(), dtype=np.float64)


def max_query_tokens(queries_ds, *, analyzer_cfg=None,
                     text_col: str = "text") -> int:
    """A4 (SURVEY.md §2.5): global max tokenized query length as a
    Dataset aggregate.

    The reference computes ``max(len(tokenizer.tokenize(q)) for q in
    queries.values())`` on the driver
    (beir_openai_embeddings_batched_parallel.py:310) and hands it to the
    retriever to budget doc truncation (:212-213). Here the counts stay
    distributed: each batch emits ONE int64 partial-max row, and only
    the scalar global max reaches the driver — a 500M-query set costs
    the driver one int.
    """
    an_cfg = analyzer_cfg or SQL_SAFE_ANALYZER

    def partial_max(batch: pa.Table) -> pa.Table:
        an = Analyzer(an_cfg)
        m = 0
        for t in batch.column(text_col).to_pylist():
            n = len(an.tokens(t or ""))
            if n > m:
                m = n
        return pa.table({"max_toks": pa.array([m], pa.int64())})

    v = queries_ds.map_batches(
        partial_max, batch_format="pyarrow"
    ).max("max_toks")
    return int(v) if v is not None else 0


def truncation_counters(docs_ds, *, max_tokens: int, analyzer_cfg=None,
                        text_col: str = "text") -> dict:
    """A3 (SURVEY.md §2.5): corpus truncation counters.

    The reference accumulates ``docs_truncated`` (docs over the token
    budget), ``toks_truncated`` (tokens dropped) and ``total_toks``
    while batching docs for the embedding API
    (beir_dense_retriever.py:160-218). Here each batch emits ONE int64
    partial row and the driver reduces one row per block — corpus-size
    independent."""
    an_cfg = analyzer_cfg or SQL_SAFE_ANALYZER

    def partial(batch: pa.Table) -> pa.Table:
        an = Analyzer(an_cfg)
        dt = tt = tot = 0
        for t in batch.column(text_col).to_pylist():
            n = len(an.tokens(t or ""))
            tot += n
            if n > max_tokens:
                dt += 1
                tt += n - max_tokens
        return pa.table(
            {"docs_truncated": pa.array([dt], pa.int64()),
             "toks_truncated": pa.array([tt], pa.int64()),
             "total_toks": pa.array([tot], pa.int64()),
             "n_docs": pa.array([batch.num_rows], pa.int64())}
        )

    parts = docs_ds.map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()  # one row per block — bounded by block count, not rows
    return {c: int(parts[c].sum()) for c in parts.columns}


def doc_token_budget(max_token_len: int, max_query_len: int) -> int:
    """Doc truncation budget from the A4 aggregate — the reference's
    rule (beir_openai_embeddings_batched_parallel.py:212-213): a doc
    with ``token_len + max_query_len > max_token_len`` keeps
    ``max_token_len - max_query_len - 1`` tokens; :97 asserts the query
    side alone never exceeds the window."""
    if max_query_len >= max_token_len:
        raise ValueError(
            f"max_query_len {max_query_len} >= context window "
            f"{max_token_len} (reference asserts the same)"
        )
    return max_token_len - max_query_len - 1


def dense_retrieve(corpus_ds, query_ids: list[int], query_texts: list[str],
                   k: int = 100, *, dim: int = 64, pooling: str = "mean",
                   max_tokens: int = 256, specb: bool = False,
                   concurrency=4, batch_size: int = 1024,
                   vec_source: str = "blake2b",
                   budget_total: int | None = None):
    """Corpus (doc_id, text) + queries -> runs (query_id, vec_id, sim, rank).

    Corpus embedding is the actor-pool stage; queries are embedded
    driver-side (tiny) and broadcast into the chunked top-k (K1).
    ``budget_total``: when set, doc-side ``max_tokens`` is derived from
    the query set per the reference's A4 rule — ``budget_total -
    max(query token len) - 1`` (queries here are a driver list, so the
    max is computed in place; :func:`max_query_tokens` is the Dataset
    form for query sets that are themselves big data).
    """
    from webindex.ann import brute_topk

    doc_max_tokens = max_tokens
    if budget_total is not None:
        an = Analyzer(SQL_SAFE_ANALYZER)
        mql = max(
            (len(an.tokens(q or "")) for q in query_texts), default=0
        )
        doc_max_tokens = doc_token_budget(budget_total, mql)

    emb = corpus_ds.map_batches(
        EmbedStage,
        fn_constructor_kwargs=dict(
            dim=dim, pooling=pooling, max_tokens=doc_max_tokens,
            role="doc" if specb else None, vec_source=vec_source,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    qvecs = embed_texts(
        query_texts, dim=dim, pooling=pooling, max_tokens=max_tokens,
        role="query" if specb else None, vec_source=vec_source,
    )
    return brute_topk(
        emb, query_ids, qvecs, k, id_col="doc_id", concurrency=concurrency
    )
