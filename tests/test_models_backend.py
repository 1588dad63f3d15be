"""Real-model backend hooks (webindex/models.py): factories fall back
to the deterministic stand-ins when torch/transformers or local weights
are absent (this sandbox/CI), and the HF paths skip cleanly."""

import numpy as np
import pyarrow as pa
import pytest

from webindex import models


def test_hf_unavailable_without_weights(tmp_path, monkeypatch):
    monkeypatch.setenv("WEBINDEX_MODELS", str(tmp_path))
    # no weights dir for the name -> unavailable regardless of torch
    assert not models.hf_available("sgpt-125m")
    assert models.model_dir("sgpt-125m") is None


def test_factories_fall_back_to_standins(tmp_path, monkeypatch):
    monkeypatch.setenv("WEBINDEX_MODELS", str(tmp_path))
    from webindex.embed import EmbedStage
    from webindex.openai_scorer import DeterministicCompletionClient
    from webindex.rerank import OverlapScorer

    st = models.make_embed_stage("sgpt-125m", dim=16, role="doc")
    assert isinstance(st, EmbedStage)
    # the stand-in still runs end to end with the factory kwargs
    out = st(pa.table({"doc_id": pa.array([1], pa.int64()),
                       "text": pa.array(["hello world"])}))
    assert out.column_names == ["doc_id", "embedding", "n_tokens",
                                "truncated"]
    assert len(out.column("embedding")[0].as_py()) == 16

    sc = models.make_pair_scorer("sgpt-125m")
    assert isinstance(sc, OverlapScorer)
    assert len(sc.predict([("a b", "a c"), ("x", "y")])) == 2

    cl = models.make_completion_client("sgpt-125m")
    assert isinstance(cl, DeterministicCompletionClient)
    r = cl(["query doc"])
    assert set(r[0]) == {"token_logprobs", "text_offset"}


def test_none_name_uses_standins():
    from webindex.embed import EmbedStage

    assert isinstance(models.make_embed_stage(None, dim=8), EmbedStage)


@pytest.mark.skipif(not models.hf_available(), reason="torch/transformers "
                    "not installed (hermetic sandbox)")
def test_hf_backend_loads_when_weights_present(tmp_path, monkeypatch):
    # Only runs where torch+transformers exist; still requires local
    # weights, so assert the clean no-weights failure mode
    monkeypatch.setenv("WEBINDEX_MODELS", str(tmp_path))
    with pytest.raises(FileNotFoundError, match="no local weights"):
        models.HFEmbedStage("sgpt-125m")


class _FakeTok:
    """Duck-typed HF-tokenizer surface for specb_pack: whitespace words
    -> ids via a growing vocab; brackets get their own ids via encode."""

    def __init__(self):
        self.vocab = {}

    def _id(self, w):
        return self.vocab.setdefault(w, len(self.vocab) + 10)

    def tokenize(self, txt):
        return txt.split()

    def convert_tokens_to_ids(self, toks):
        return [self._id(t) for t in toks]

    def encode(self, txt):
        return [self._id(txt)]

    def prepare_for_model(self, ids, add_special_tokens=True):
        # GPT-style: no model specials added
        return {"input_ids": list(ids), "attention_mask": [1] * len(ids)}


def test_specb_pack_matches_reference_semantics():
    """ADVICE r3 (medium): brackets are separately-encoded token ids
    concatenated AROUND the pre-truncated text tokens — the text budget
    is max_tokens - 2, the opening bracket can never merge with the
    first word, and right-truncation can never drop the closing
    bracket (reference beir_dense_retriever.py:134-198)."""
    tok = _FakeTok()
    text = " ".join(f"w{i}" for i in range(10))

    # long text, query role, max_tokens=6 -> 4 text tokens + brackets
    ids, mask, trunc = models.specb_pack(
        tok, [text], role="query", max_tokens=6)
    assert trunc == [True]
    assert len(ids[0]) == 6 and len(mask[0]) == 6
    assert ids[0][0] == tok.vocab["["]      # opening bracket, own token
    assert ids[0][-1] == tok.vocab["]"]     # closing bracket SURVIVES
    assert ids[0][1:-1] == tok.convert_tokens_to_ids(
        ["w0", "w1", "w2", "w3"])           # text truncated to max-2
    assert mask[0] == [1] * 6

    # doc role uses curly brackets; left truncation keeps the tail
    ids, _, _ = models.specb_pack(
        tok, [text], role="doc", max_tokens=6, truncate_side="left")
    assert ids[0][0] == tok.vocab["{"] and ids[0][-1] == tok.vocab["}"]
    assert ids[0][1:-1] == tok.convert_tokens_to_ids(
        ["w6", "w7", "w8", "w9"])

    # no role -> no brackets, full max_tokens budget for text
    ids, mask, trunc = models.specb_pack(
        tok, [text], role=None, max_tokens=6)
    assert len(ids[0]) == 6 and trunc == [True]
    assert ids[0] == tok.convert_tokens_to_ids(
        ["w0", "w1", "w2", "w3", "w4", "w5"])

    # short text: untruncated, newlines normalized to spaces
    ids, mask, trunc = models.specb_pack(
        tok, ["a\nb"], role="query", max_tokens=6)
    assert trunc == [False]
    assert ids[0] == [tok.vocab["["], tok.vocab["a"], tok.vocab["b"],
                      tok.vocab["]"]]


def test_hf_completion_client_shape_contract():
    """The stand-in's response shape is exactly what get_score consumes
    — the same contract HFCompletionClient implements."""
    from webindex.openai_scorer import (DeterministicCompletionClient,
                                        construct_context, get_score)

    cl = DeterministicCompletionClient()
    ctx = construct_context("a query", "some document text")
    r = cl([ctx])[0]
    s = get_score(ctx, "a query", r["token_logprobs"], r["text_offset"])
    assert np.isfinite(s)
