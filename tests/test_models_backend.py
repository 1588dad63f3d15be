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
