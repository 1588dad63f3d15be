"""Optional real-model backends behind the engine's scorer duck-types.

The engine's semantic stages are pluggable by construction:

- dense encode: any callable-class with ``EmbedStage``'s output schema
  ``(id, embedding, n_tokens, truncated)`` (webindex/embed.py);
- cross-encoder rerank: any object with ``predict(pairs) -> list[float]``
  (webindex/rerank.py PairScoreStage — the sentence-transformers
  CrossEncoder surface);
- completion scoring: any ``client(prompts) -> [{"token_logprobs",
  "text_offset"}]`` (webindex/openai_scorer.py).

This module provides HuggingFace-backed implementations of all three
that activate ONLY when (a) ``torch`` + ``transformers`` import and (b)
local weights exist under ``$WEBINDEX_MODELS`` (no network — models must
be pre-downloaded; the sandbox/CI has neither, so every factory falls
back to the deterministic stand-ins and the test suite skips the HF
paths cleanly). This closes the reference-parity gap the day weights
are available without touching CI hermeticity:

- ``HFEmbedStage`` mirrors the reference's SGPT encode semantics
  (biencoder/beir/beir_dense_retriever.py:106-314): specb bracket
  wrapping per role, tokenizer truncation with the pinned side,
  position-weighted mean pooling over the last hidden state.
- ``HFCausalScorer`` mirrors GPT continuation log-prob reranking
  (crossencoder/beir/sgptce.py:199-260): score = sum of the
  continuation span's token log-probs under a causal LM.
- ``HFCompletionClient`` mirrors the OpenAI ``echo`` logprob response
  shape consumed by openai_scorer.get_score.

Stage shape note: all three load the model in ``__init__`` — once per
Ray actor (map_batches ``concurrency=(1, N)`` actor pools), never per
batch.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

_DEFAULT_ROOT = os.path.expanduser("~/.cache/webindex-models")


def weights_root() -> str:
    return os.environ.get("WEBINDEX_MODELS", _DEFAULT_ROOT)


def model_dir(name: str) -> str | None:
    """Local directory for ``name`` under the weights root, or None."""
    d = os.path.join(weights_root(), name)
    return d if os.path.isdir(d) else None


def hf_available(name: str | None = None) -> bool:
    """True iff torch+transformers import AND (if given) local weights
    for ``name`` exist. Never touches the network."""
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401
    except Exception:
        return False
    return True if name is None else model_dir(name) is not None


def specb_pack(tok, texts: list[str], *, role: str | None,
               max_tokens: int, truncate_side: str = "right"):
    """SGPT specb token assembly, exactly the reference's order of
    operations (beir_dense_retriever.py:130-198): the TEXT token list is
    truncated to a budget of ``max_tokens - 2`` first, and the bracket
    token ids — encoded separately, so they can never merge with a text
    token or be truncated away — are concatenated around it, with the
    attention mask extended to match.

    ``tok`` is duck-typed (tokenize / convert_tokens_to_ids /
    prepare_for_model / encode — the HF tokenizer surface), so the
    assembly is unit-testable without torch. Returns
    ``(ids_list, mask_list, truncated_list)``.
    """
    def _enc(s: str) -> list:
        # bracket ids must be BARE tokens: the reference's plain
        # encode() is equivalent for GPT-style tokenizers (no model
        # specials), but a CLS/SEP- or BOS-injecting tokenizer would
        # otherwise smuggle specials inside the brackets and silently
        # shrink the text budget
        try:
            return tok.encode(s, add_special_tokens=False)
        except TypeError:  # duck-typed test tokenizers
            return tok.encode(s)

    if role == "query":
        bos, eos = _enc("["), _enc("]")
    elif role == "doc":
        bos, eos = _enc("{"), _enc("}")
    else:
        bos = eos = []
    # prepare_for_model(add_special_tokens=True) may inject CLS/SEP/BOS
    # around the text; budget for those too (0 for GPT-style tokenizers,
    # 2 for BERT-style — the reference shrinks max_token_len by 2 there),
    # so len(ids) <= max_tokens holds for ANY tokenizer.
    try:
        n_special = int(tok.num_special_tokens_to_add())
    except (AttributeError, TypeError):
        n_special = 0
    budget = max(0, max_tokens - (len(bos) + len(eos)) - n_special)
    ids_list, mask_list, trunc = [], [], []
    for t in texts:
        # OpenAI-docs recommendation mirrored by the reference
        toks = tok.convert_tokens_to_ids(
            tok.tokenize((t or "").replace("\n", " "))
        )
        trunc.append(len(toks) > budget)
        if truncate_side == "right":
            kept = toks[:budget]
        else:
            kept = toks[-budget:] if budget else []
        d = tok.prepare_for_model(kept, add_special_tokens=True)
        ids_list.append(bos + d["input_ids"] + eos)
        mask_list.append(
            [1] * len(bos) + d["attention_mask"] + [1] * len(eos)
        )
    return ids_list, mask_list, trunc


class HFEmbedStage:
    """HF-backed drop-in for :class:`webindex.embed.EmbedStage`.

    Same output schema; ``role`` selects SGPT specb brackets ("[" "]"
    for queries, "{" "}" for docs) appended as SEPARATELY-ENCODED token
    ids around the pre-truncated text tokens (:func:`specb_pack`) —
    never wrapped into the raw text, where the opening bracket could
    merge with the first word and right-truncation could drop the
    closing bracket (reference: beir_dense_retriever.py:134-198)."""

    def __init__(self, name: str, *, role: str | None = None,
                 max_tokens: int = 300, truncate_side: str = "right",
                 id_col: str = "doc_id", text_col: str = "text",
                 batch_size: int = 32):
        import torch
        from transformers import AutoModel, AutoTokenizer

        d = model_dir(name)
        if d is None:
            raise FileNotFoundError(
                f"no local weights for {name!r} under {weights_root()} "
                "(set WEBINDEX_MODELS; no network download is attempted)"
            )
        self.tok = AutoTokenizer.from_pretrained(d)
        if self.tok.pad_token is None:
            self.tok.pad_token = self.tok.eos_token
        self.model = AutoModel.from_pretrained(d)
        self.model.eval()
        self.torch = torch
        self.role = role
        self.max_tokens = max_tokens
        self.truncate_side = truncate_side
        self.id_col = id_col
        self.text_col = text_col
        self.batch_size = batch_size

    def _encode(self, texts: list[str]):
        torch = self.torch
        ids, mask, trunc = specb_pack(
            self.tok, texts, role=self.role, max_tokens=self.max_tokens,
            truncate_side=self.truncate_side,
        )
        enc = self.tok.pad(
            {"input_ids": ids, "attention_mask": mask},
            padding=True, return_tensors="pt",
        )
        with torch.no_grad():
            out = self.model(**enc).last_hidden_state  # (b, t, d)
        amask = enc["attention_mask"].unsqueeze(-1).float()
        # SGPT position-weighted mean over real tokens (weights 1..t)
        w = torch.arange(
            1, out.shape[1] + 1, dtype=torch.float32
        ).unsqueeze(0).unsqueeze(-1)
        num = (out * amask * w).sum(dim=1)
        den = (amask * w).sum(dim=1).clamp(min=1e-9)
        emb = (num / den).cpu().numpy().astype(np.float32)
        n_tok = enc["attention_mask"].sum(dim=1).cpu().numpy()
        return emb, n_tok, trunc

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        embs, n_toks, trunc = [], [], []
        for i in range(0, len(texts), self.batch_size):
            chunk = texts[i: i + self.batch_size]
            e, n, t = self._encode(chunk)
            embs.append(e)
            n_toks.extend(int(x) for x in n)
            trunc.extend(t)
        emb = np.concatenate(embs) if embs else np.zeros((0, 0), np.float32)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "embedding": pa.array(
                    [v.tolist() for v in emb], pa.list_(pa.float32())
                ),
                "n_tokens": pa.array(n_toks, pa.int32()),
                "truncated": pa.array(trunc, pa.bool_()),
            }
        )


class HFCausalScorer:
    """``predict(pairs) -> list[float]``: continuation log-prob scoring
    under a local causal LM (the sgptce rule: score(q, d) = sum of the
    query-span token log-probs given the document prompt)."""

    def __init__(self, name: str, *, template: str = None,
                 batch_size: int = 8):
        import torch
        from transformers import AutoModelForCausalLM, AutoTokenizer

        d = model_dir(name)
        if d is None:
            raise FileNotFoundError(
                f"no local weights for {name!r} under {weights_root()}"
            )
        self.tok = AutoTokenizer.from_pretrained(d)
        self.model = AutoModelForCausalLM.from_pretrained(d)
        self.model.eval()
        self.torch = torch
        self.template = (
            template
            or 'Documents are searched to find matches with the same '
               'content.\nThe document "{doc}" is a good search result '
               'for "'
        )
        self.batch_size = batch_size

    def _score_one(self, query: str, doc: str) -> float:
        torch = self.torch
        prompt = self.template.format(doc=doc)
        p_ids = self.tok(prompt, return_tensors="pt")["input_ids"][0]
        full_ids = self.tok(prompt + query, return_tensors="pt")[
            "input_ids"
        ][0]
        with torch.no_grad():
            logits = self.model(full_ids.unsqueeze(0)).logits[0]
        logprobs = torch.log_softmax(logits.float(), dim=-1)
        total = 0.0
        for pos in range(len(p_ids), len(full_ids)):
            total += float(logprobs[pos - 1, full_ids[pos]])
        return total

    def predict(self, pairs: list[tuple[str, str]]) -> list[float]:
        from webindex.rerank import Reorderer

        reorder = Reorderer(pairs, length_fn=lambda p: len(p[1]))
        scores = [self._score_one(q, d) for q, d in reorder.items]
        return reorder.restore(scores)


class HFCompletionClient:
    """``client(prompts)`` -> OpenAI-``echo``-shaped logprob responses
    from a local causal LM (token_logprobs + text_offset), consumable by
    :func:`webindex.openai_scorer.get_score` unchanged."""

    def __init__(self, name: str):
        import torch
        from transformers import AutoModelForCausalLM, AutoTokenizer

        d = model_dir(name)
        if d is None:
            raise FileNotFoundError(
                f"no local weights for {name!r} under {weights_root()}"
            )
        self.tok = AutoTokenizer.from_pretrained(d)
        self.model = AutoModelForCausalLM.from_pretrained(d)
        self.model.eval()
        self.torch = torch

    def __call__(self, prompts: list[str]) -> list[dict]:
        torch = self.torch
        out = []
        for p in prompts:
            enc = self.tok(p, return_offsets_mapping=True,
                           return_tensors="pt")
            ids = enc["input_ids"][0]
            offsets = [int(a) for a, _ in enc["offset_mapping"][0]]
            with torch.no_grad():
                logits = self.model(ids.unsqueeze(0)).logits[0]
            lp = torch.log_softmax(logits.float(), dim=-1)
            token_lp = [0.0] + [
                float(lp[i - 1, ids[i]]) for i in range(1, len(ids))
            ]
            if not offsets:
                offsets, token_lp = [0], [0.0]
            out.append({"token_logprobs": token_lp,
                        "text_offset": offsets})
        return out


# -- factories: real model iff weights present, else the deterministic
# -- stand-ins (CI stays hermetic; contract entries pin the stand-ins
# -- explicitly and never route through these)

def make_embed_stage(name: str | None = None, **kw):
    if name and hf_available(name):
        return HFEmbedStage(name, **{
            k: v for k, v in kw.items()
            if k in ("role", "max_tokens", "truncate_side", "id_col",
                     "text_col", "batch_size")
        })
    from webindex.embed import EmbedStage

    kw.pop("batch_size", None)
    return EmbedStage(**kw)


def make_pair_scorer(name: str | None = None, **kw):
    if name and hf_available(name):
        return HFCausalScorer(name, **kw)
    from webindex.rerank import OverlapScorer

    return OverlapScorer()


def make_completion_client(name: str | None = None):
    if name and hf_available(name):
        return HFCompletionClient(name)
    from webindex.openai_scorer import DeterministicCompletionClient

    return DeterministicCompletionClient()
