"""SentenceTransformer-style ordered module pipeline (SURVEY.md §2.3 T5,
§2.10 "module pipeline" hook).

Reference semantics re-expressed, not ported:

- ``SentenceTransformer(modules=[Transformer, Pooling, Dense])`` executes
  an ORDERED module list, each module transforming a shared features dict
  (reference ``sentence_transformers/SentenceTransformer.py:45-105``);
- ``Asym`` holds named sub-chains and routes each input through the chain
  its dict key selects (reference ``models/Asym.py:10-57``; consumed by
  ``biencoder/beir/custommodels/sentence_bert_asym.py:8-79``, which tags
  queries/docs with different keys);
- ``Dense`` is a linear projection + activation appended after pooling
  (reference ``models/Dense.py``).

Here a module is any callable ``features -> features`` over a plain dict
of numpy arrays (``text`` in; ``token_matrices`` / ``sentence_embedding``
accreted), the chain is a list, and the per-role routing is a column
branch: :class:`AsymModule` groups batch rows by the role column value,
runs each group through its sub-chain, and reassembles input order.
Ray-side, :class:`ModuleEncodeStage` is the actor-pool ``map_batches``
wrapper — the chain is built ONCE per actor in ``__init__``.

The token/vector backend is the deterministic stand-in
(:mod:`webindex.embed`), so chains compose with every pooling variant and
stay bit-reproducible across workers; the HF-backed stage
(:class:`webindex.models.HFEmbedStage`) remains the real-weights analog.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from webindex.analyze import Analyzer
from webindex.config import SQL_SAFE_ANALYZER
from webindex.embed import (POOLINGS, _LAYERED, pool, token_vector,
                            token_vector_poly)


class TokenizerModule:
    """Transformer analog: ``text`` -> ragged per-row token matrices.

    ``role`` wraps specb markers (queries ``[`` ``]``, docs ``{`` ``}``)
    exactly like :class:`webindex.embed.EmbedStage`; truncation applies
    AFTER wrapping (the stand-in's pinned semantics)."""

    def __init__(self, dim: int = 64, max_tokens: int = 256,
                 truncate_side: str = "right", role: str | None = None,
                 analyzer_cfg=None, vec_source: str = "blake2b"):
        assert truncate_side in ("right", "left")
        self.an = Analyzer(analyzer_cfg or SQL_SAFE_ANALYZER)
        self.dim = dim
        self.max_tokens = max_tokens
        self.truncate_side = truncate_side
        self.vec = (token_vector_poly if vec_source == "poly"
                    else token_vector)
        if role == "query":
            self.wrap = ("[", "]")
        elif role == "doc":
            self.wrap = ("{", "}")
        else:
            self.wrap = None
        self._vocab: dict[str, np.ndarray] = {}

    def _v(self, tok: str) -> np.ndarray:
        v = self._vocab.get(tok)
        if v is None:
            v = self._vocab[tok] = self.vec(tok, self.dim)
        return v

    def __call__(self, features: dict) -> dict:
        mats, n_toks, trunc = [], [], []
        for text in features["text"]:
            toks = self.an.tokens(text or "")
            if self.wrap:
                toks = [self.wrap[0]] + toks + [self.wrap[1]]
            t = len(toks) > self.max_tokens
            if t:
                toks = (toks[: self.max_tokens]
                        if self.truncate_side == "right"
                        else toks[-self.max_tokens:])
            mats.append(
                np.stack([self._v(tk) for tk in toks])
                if toks else np.zeros((0, self.dim))
            )
            n_toks.append(len(toks))
            trunc.append(t)
        features["token_matrices"] = mats
        features["n_tokens"] = np.array(n_toks, np.int32)
        features["truncated"] = np.array(trunc, bool)
        return features


class PoolingModule:
    """A1 reduction over each token matrix -> ``sentence_embedding``."""

    def __init__(self, method: str = "mean", position_weights=None):
        assert method in POOLINGS
        if method in _LAYERED:
            raise ValueError(
                f"layered pooling {method!r} needs the multi-layer stage "
                "(EmbedStage n_layers); the module chain carries one layer"
            )
        self.method = method
        self.position_weights = position_weights

    def __call__(self, features: dict) -> dict:
        features["sentence_embedding"] = np.stack(
            [pool(m, self.method, position_weights=self.position_weights)
             for m in features["token_matrices"]]
        )
        return features


class DenseModule:
    """Dense analog (reference ``models/Dense.py``): deterministic linear
    projection + tanh on ``sentence_embedding``. Weights derive from the
    blake2b token-vector generator seeded by ``name`` — reproducible
    across processes, no stored parameters."""

    def __init__(self, in_dim: int, out_dim: int, *, name: str = "dense",
                 activation: str = "tanh"):
        assert activation in ("tanh", "identity")
        self.w = np.stack(
            [token_vector(f"{name}\x00w{j}", in_dim)
             for j in range(out_dim)], axis=1
        )  # (in_dim, out_dim)
        self.b = token_vector(f"{name}\x00b", out_dim)
        self.act = np.tanh if activation == "tanh" else (lambda x: x)

    def __call__(self, features: dict) -> dict:
        e = features["sentence_embedding"]
        features["sentence_embedding"] = self.act(e @ self.w + self.b)
        return features


class NormalizeModule:
    """L2-normalize ``sentence_embedding`` (reference ``models/Normalize``)."""

    def __call__(self, features: dict) -> dict:
        e = features["sentence_embedding"]
        n = np.linalg.norm(e, axis=1, keepdims=True)
        features["sentence_embedding"] = e / np.maximum(n, 1e-12)
        return features


class ModuleChain:
    """Ordered module list; ``encode`` runs texts through every stage."""

    def __init__(self, modules: list):
        self.modules = list(modules)

    def __call__(self, features: dict) -> dict:
        for m in self.modules:
            features = m(features)
        return features

    def encode(self, texts: list[str]) -> np.ndarray:
        return self({"text": list(texts)})["sentence_embedding"]


class AsymModule:
    """Per-role routing (reference ``models/Asym.py:10-57``): each row
    goes through the sub-chain named by its role; output order is input
    order. Unknown roles raise (the reference KeyErrors the same way)."""

    def __init__(self, sub: dict[str, ModuleChain]):
        self.sub = dict(sub)

    def encode(self, texts: list[str], roles: list[str]) -> np.ndarray:
        if len(texts) != len(roles):
            raise ValueError("texts and roles must align")
        roles = list(roles)
        out: np.ndarray | None = None
        for role in sorted(set(roles)):
            chain = self.sub.get(role)
            if chain is None:
                raise KeyError(f"no sub-chain for role {role!r} "
                               f"(have {sorted(self.sub)})")
            idx = [i for i, r in enumerate(roles) if r == role]
            emb = chain.encode([texts[i] for i in idx])
            if out is None:
                out = np.zeros((len(texts), emb.shape[1]), emb.dtype)
            elif emb.shape[1] != out.shape[1]:
                raise ValueError(
                    f"sub-chain for role {role!r} emits dim "
                    f"{emb.shape[1]}, others emit {out.shape[1]} — Asym "
                    "sub-chains must share an output dimension"
                )
            out[idx] = emb
        if out is None:
            out = np.zeros((0, 0))
        return out


class ModuleEncodeStage:
    """Actor-pool ``map_batches`` stage holding a module chain.

    ``chain_spec`` is a zero-arg factory returning a :class:`ModuleChain`
    or :class:`AsymModule` — built once per actor (T-rule: state in
    ``__init__``). With ``role_col`` set the chain must be an
    :class:`AsymModule` and each row routes by that column's value."""

    def __init__(self, chain_spec, *, id_col: str = "doc_id",
                 text_col: str = "text", role_col: str | None = None):
        self.chain = chain_spec()
        self.id_col = id_col
        self.text_col = text_col
        self.role_col = role_col
        if role_col is not None and not isinstance(self.chain, AsymModule):
            raise TypeError("role_col routing needs an AsymModule chain")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        if self.role_col is None:
            emb = self.chain.encode(texts)
        else:
            emb = self.chain.encode(
                texts, batch.column(self.role_col).to_pylist()
            )
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "embedding": pa.array(
                    [row.tolist() for row in emb],
                    pa.list_(pa.float64()),
                ),
            }
        )
