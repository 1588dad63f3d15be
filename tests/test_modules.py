"""T5 module pipeline (webindex/modules.py): ordered chain semantics,
Dense math, Asym per-role routing, and the Ray actor stage — all against
the pinned EmbedStage / hand numpy oracles."""

import numpy as np
import pyarrow as pa
import pytest

from webindex.embed import EmbedStage, token_vector
from webindex.modules import (AsymModule, DenseModule, ModuleChain,
                              ModuleEncodeStage, NormalizeModule,
                              PoolingModule, TokenizerModule)

TEXTS = ["alpha beta gamma", "", "one two three four five six seven",
         "the quick brown fox"]


def _embed_stage_embs(texts, *, role, pooling="mean", dim=16,
                      max_tokens=5):
    st = EmbedStage(dim=dim, pooling=pooling, max_tokens=max_tokens,
                    role=role, vec_source="poly")
    out = st(pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                       "text": pa.array(texts)}))
    return np.array(out.column("embedding").to_pylist(), np.float64)


def test_chain_matches_embed_stage():
    """Tokenizer -> Pooling composed as a chain is bit-identical to the
    monolithic EmbedStage for every non-layered pooling."""
    for pooling in ("mean", "weightedmean", "lasttoken"):
        chain = ModuleChain([
            TokenizerModule(dim=16, max_tokens=5, role="doc",
                            vec_source="poly"),
            PoolingModule(pooling),
        ])
        got = chain.encode(TEXTS)
        want = _embed_stage_embs(TEXTS, role="doc", pooling=pooling)
        np.testing.assert_array_equal(got, want)


def test_chain_feature_accretion():
    feats = ModuleChain([
        TokenizerModule(dim=8, max_tokens=3, role=None),
        PoolingModule("mean"),
    ])({"text": ["a b c d e", ""]})
    assert feats["n_tokens"].tolist() == [3, 0]
    assert feats["truncated"].tolist() == [True, False]
    assert feats["sentence_embedding"].shape == (2, 8)
    # empty text pools to the zero vector (0, d) -> mean 0
    np.testing.assert_array_equal(feats["sentence_embedding"][1],
                                  np.zeros(8))


def test_layered_pooling_rejected():
    with pytest.raises(ValueError, match="layered"):
        PoolingModule("meanmean")


def test_dense_module_math_and_determinism():
    rng = np.random.default_rng(3)
    e = rng.standard_normal((5, 16))
    d = DenseModule(16, 4, name="proj")
    out = d({"sentence_embedding": e.copy()})["sentence_embedding"]
    w = np.stack([token_vector("proj\x00w%d" % j, 16) for j in range(4)],
                 axis=1)
    b = token_vector("proj\x00b", 4)
    np.testing.assert_array_equal(out, np.tanh(e @ w + b))
    # same name -> same weights in a fresh module (cross-process story)
    out2 = DenseModule(16, 4, name="proj")(
        {"sentence_embedding": e.copy()})["sentence_embedding"]
    np.testing.assert_array_equal(out, out2)
    # identity activation
    lin = DenseModule(16, 4, name="proj", activation="identity")(
        {"sentence_embedding": e.copy()})["sentence_embedding"]
    np.testing.assert_array_equal(lin, e @ w + b)


def test_normalize_module():
    e = np.array([[3.0, 4.0], [0.0, 0.0]])
    out = NormalizeModule()({"sentence_embedding": e})["sentence_embedding"]
    np.testing.assert_allclose(out[0], [0.6, 0.8])
    np.testing.assert_array_equal(out[1], [0.0, 0.0])  # no div-by-zero


def test_asym_routes_per_role_and_preserves_order():
    """Reference Asym semantics: each row runs the chain its key names;
    interleaved roles come back in input order; unknown roles raise."""
    q_chain = ModuleChain([
        TokenizerModule(dim=16, max_tokens=5, role="query",
                        vec_source="poly"),
        PoolingModule("mean"),
    ])
    d_chain = ModuleChain([
        TokenizerModule(dim=16, max_tokens=5, role="doc",
                        vec_source="poly"),
        PoolingModule("weightedmean"),
    ])
    asym = AsymModule({"query": q_chain, "doc": d_chain})
    roles = ["doc", "query", "doc", "query"]
    got = asym.encode(TEXTS, roles)
    for i, (t, r) in enumerate(zip(TEXTS, roles)):
        want = (q_chain if r == "query" else d_chain).encode([t])[0]
        np.testing.assert_array_equal(got[i], want)
    with pytest.raises(KeyError, match="no sub-chain"):
        asym.encode(["x"], ["unknown"])
    with pytest.raises(ValueError):
        asym.encode(["x"], ["query", "doc"])
    # sub-chains must agree on output dim
    bad = AsymModule({
        "query": q_chain,
        "doc": ModuleChain([
            TokenizerModule(dim=16, max_tokens=5, role="doc",
                            vec_source="poly"),
            PoolingModule("mean"),
            DenseModule(16, 8, name="shrink"),
        ]),
    })
    with pytest.raises(ValueError, match="share an output dimension"):
        bad.encode(["x", "y"], ["doc", "query"])


def test_module_encode_stage_on_ray(ray_session):
    """The actor stage: chain built once per actor; role-column routing
    over a mixed Dataset equals the per-role driver-side chains."""
    import ray.data as rd

    def make_asym():
        return AsymModule({
            "query": ModuleChain([
                TokenizerModule(dim=16, max_tokens=5, role="query",
                                vec_source="poly"),
                PoolingModule("mean"),
            ]),
            "doc": ModuleChain([
                TokenizerModule(dim=16, max_tokens=5, role="doc",
                                vec_source="poly"),
                PoolingModule("mean"),
                DenseModule(16, 16, name="docproj"),
            ]),
        })

    roles = ["doc", "query", "doc", "query"]
    ds = rd.from_items(
        [{"doc_id": i, "text": t, "role": r}
         for i, (t, r) in enumerate(zip(TEXTS, roles))]
    ).repartition(2)
    out = ds.map_batches(
        ModuleEncodeStage,
        fn_constructor_kwargs=dict(chain_spec=make_asym, role_col="role"),
        batch_format="pyarrow", concurrency=1,
    ).to_pandas().sort_values("doc_id")

    asym = make_asym()
    for _, row in out.iterrows():
        i = int(row["doc_id"])
        want = asym.encode([TEXTS[i]], [roles[i]])[0]
        np.testing.assert_array_equal(np.array(row["embedding"]), want)

    # plain (non-Asym) chain without role_col
    plain = ds.drop_columns(["role"]).map_batches(
        ModuleEncodeStage,
        fn_constructor_kwargs=dict(
            chain_spec=lambda: ModuleChain([
                TokenizerModule(dim=16, max_tokens=5, vec_source="poly"),
                PoolingModule("mean"),
            ]),
        ),
        batch_format="pyarrow", concurrency=1,
    ).to_pandas()
    assert len(plain) == len(TEXTS)

    # role_col with a non-Asym chain is a loud config error
    with pytest.raises(TypeError, match="AsymModule"):
        ModuleEncodeStage(
            chain_spec=lambda: ModuleChain([]), role_col="role"
        )
