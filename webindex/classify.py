"""Corpus-trained quality classifier: hashed bag-of-words logistic
regression fit by distributed IRLS (Newton) — the GPT-3/PaLM "quality
filter" step (train a linear classifier that imitates a trusted-style
signal, keep high-scoring docs; public method, Brown et al. 2020
App. A; no reference counterpart — the reference consumes curated BEIR
corpora, SURVEY.md §2.2).

Optimizer choice: plain GD on L1-normalized bag-of-words is hopelessly
ill-conditioned (measured: 300 passes, no separation); IRLS converges
in ~3 passes. Each Newton step needs the exact gradient (D) and
Hessian (D x D), so D is pinned SMALL (default 512) — the per-batch
Hessian partial is D^2 int64 = 2 MB, bounded and corpus-independent.
(Past D ~ 2k you would switch to L-BFGS minibatches and give up exact
partition invariance; documented tradeoff, not built.)

Determinism contract (same discipline as graph.py PageRank): float
sums across partitions are order-dependent, so every cross-partition
reduction is EXACT int64 fixed-point — each doc's float64 gradient and
Hessian contributions are rounded per-entry to GRAD_SCALE micro-units
(a per-doc operation, identical under any partitioning/batching),
summed in int64 (commutative, exact). The driver converts once per
iteration and takes the Newton step in float64 (driver-only math, no
partition dependence). The trained weight sequence — and therefore
every score — is identical across partition counts, batch sizes and
CPU counts (asserted in tests/test_classify.py).

Scale shape: features are built ONCE (stateless vectorized
map_batches -> materialized (doc_id, y, idx, val) Dataset); each IRLS
iteration is one streaming pass that broadcasts the D-dim weight
vector via ``ray.put`` and reduces one (D + D^2) int64 partial per
batch — driver traffic is n_blocks x ~2 MB per iteration,
corpus-size-independent. At 100 TB you train on a deterministic
doc_id-hash subsample (the GPT-3 filter trains on a sample too —
``sample_frac``) and stream the full corpus only for scoring.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DIM = 512  # hashed feature dim; index 0 is the bias (see module doc)
GRAD_SCALE = 10**9  # int64 micro-units per unit gradient/Hessian
SCORE_SCALE = 10**6  # emitted scores are micro-rounded (contract surface)


def _sigmoid_scalar(z: float) -> float:
    """Scalar sigmoid via math.exp (bit-identical across processes;
    scalar libm, no SIMD variance — measured repo invariant)."""
    import math

    if z >= 0:
        return 1.0 / (1.0 + math.exp(-z))
    ez = math.exp(z)
    return ez / (1.0 + ez)


def _dot_fsum(a: np.ndarray, b: np.ndarray) -> float:
    """Exactly-rounded dot product (math.fsum): the ONE float reduction
    in this module, made summation-ORDER-INDEPENDENT so engine, test
    reference and any partitioning agree bit for bit (numpy pairwise /
    reduceat / sequential all differ — measured repo invariant)."""
    import math

    return math.fsum((a * b).tolist())


def add_stopword_label(docs_ds, *, threshold: float = 0.06,
                       text_col: str = "text"):
    """Attach ``label`` = 1 iff the doc's Lucene-stopword token ratio
    >= threshold — the deterministic "trusted style" proxy the tests
    and contract train against. In a real pipeline the label column
    comes from your trusted-vs-crawl split (WebText vs CommonCrawl in
    GPT-3); any 0/1 ``label`` column works."""
    from webindex.analyze import LUCENE_STOPWORDS
    from webindex.textstats import _ASCII_TOK_RE

    def lab(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch.column(text_col).to_pylist():
            toks = _ASCII_TOK_RE.findall((t or "").lower())
            if not toks:
                out.append(0)
                continue
            r = sum(1 for w in toks if w in LUCENE_STOPWORDS) / len(toks)
            out.append(1 if r >= threshold else 0)
        return batch.append_column("label", pa.array(out, pa.int64()))

    return docs_ds.map_batches(lab, batch_format="pyarrow")


def featurize(docs_ds, *, label_col: str = "label",
              text_col: str = "text", id_col: str = "doc_id",
              dim: int = DIM):
    """docs (with a 0/1 label column) -> materialized (doc_id, y,
    idx:list<int32>, val:list<float64>) feature Dataset. Features:
    hashed unigram relative frequencies (tf / doclen) + constant bias
    at index 0; hashing is stable_hash64, process-independent."""
    from webindex.textstats import _ASCII_TOK_RE
    from webindex.util import stable_hash64

    def feats(batch: pa.Table) -> pa.Table:
        from collections import Counter

        memo: dict[str, int] = {}
        idx_rows, val_rows = [], []
        for t in batch.column(text_col).to_pylist():
            tf = Counter(_ASCII_TOK_RE.findall((t or "").lower()))
            n = max(sum(tf.values()), 1)
            pairs: dict[int, float] = {0: 1.0}  # bias
            for w, c in tf.items():
                j = memo.get(w)
                if j is None:
                    j = memo[w] = 1 + stable_hash64(w) % (dim - 1)
                pairs[j] = pairs.get(j, 0.0) + c / n
            ks = sorted(pairs)  # pinned feature order
            idx_rows.append(list(ks))
            val_rows.append([pairs[k] for k in ks])
        return pa.table(
            {
                "doc_id": batch.column(id_col),
                "y": pa.array(
                    [int(v) for v in batch.column(label_col).to_pylist()],
                    pa.int64(),
                ),
                "idx": pa.array(idx_rows, pa.list_(pa.int32())),
                "val": pa.array(val_rows, pa.list_(pa.float64())),
            }
        )

    return docs_ds.map_batches(feats, batch_format="pyarrow").materialize()


def _batch_sparse(batch: pa.Table):
    idx = batch.column("idx")
    val = batch.column("val")
    if isinstance(idx, pa.ChunkedArray):
        idx = idx.combine_chunks()
    if isinstance(val, pa.ChunkedArray):
        val = val.combine_chunks()
    offs = idx.offsets.to_numpy()
    return (offs, idx.values.to_numpy(), val.values.to_numpy(),
            batch.column("y").to_numpy().astype(np.float64))


def train_quality_classifier(feat_ds, *, dim: int = DIM,
                             lam: float = 1e-4, iters: int = 6):
    """Distributed IRLS over the feature Dataset -> float64 weights.

    Per iteration: broadcast w; each batch walks its docs SPARSELY
    (per-doc gradient r_i*x_i and Hessian s_i*x_i x_i^T on the active
    indices only, each entry rounded to int64 micro-units — per-doc, so
    batching never changes it) and emits ONE (D + D^2) int64 partial;
    the driver folds partials exactly and solves the Newton system in
    float64 with ridge ``lam``."""
    import ray

    n_total = feat_ds.count()
    w = np.zeros(dim, dtype=np.float64)
    for _ in range(iters):
        ref = ray.put(w)

        def gh(batch: pa.Table) -> pa.Table:
            import ray as _ray

            wv = _ray.get(ref)
            offs, flat_i, flat_v, y = _batch_sparse(batch)
            G = np.zeros(dim, dtype=np.int64)
            H = np.zeros((dim, dim), dtype=np.int64)
            for d in range(len(y)):
                lo, hi = offs[d], offs[d + 1]
                ix, xv = flat_i[lo:hi], flat_v[lo:hi]
                p = _sigmoid_scalar(_dot_fsum(wv[ix], xv))
                r, s = p - y[d], p * (1.0 - p)
                G[ix] += np.rint(r * xv * GRAD_SCALE).astype(np.int64)
                H[np.ix_(ix, ix)] += np.rint(
                    s * np.outer(xv, xv) * GRAD_SCALE
                ).astype(np.int64)
            return pa.table(
                {
                    "g": pa.array([G.tolist()], pa.list_(pa.int64())),
                    "h": pa.array([H.ravel().tolist()],
                                  pa.list_(pa.int64())),
                }
            )

        parts = feat_ds.map_batches(gh, batch_format="pyarrow").take_all()
        G = np.zeros(dim, dtype=np.int64)
        H = np.zeros(dim * dim, dtype=np.int64)
        for row in parts:
            G += np.asarray(row["g"], dtype=np.int64)
            H += np.asarray(row["h"], dtype=np.int64)
        Gf = G.astype(np.float64) / GRAD_SCALE / n_total + lam * w
        Hf = (H.astype(np.float64) / GRAD_SCALE / n_total).reshape(
            dim, dim
        ) + lam * np.eye(dim)
        w = w - np.linalg.solve(Hf, Gf)
    return w


def score_quality(feat_ds, w: np.ndarray, *, dim: int = DIM):
    """feature Dataset + trained w -> (doc_id, y, score_micro): sigmoid
    score micro-rounded to int64 (partition-independent surface)."""
    import ray

    ref = ray.put(np.asarray(w, dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        import ray as _ray

        wv = _ray.get(ref)
        offs, flat_i, flat_v, _ = _batch_sparse(batch)
        p = np.array(
            [
                _sigmoid_scalar(
                    _dot_fsum(flat_v[offs[d]:offs[d + 1]],
                              wv[flat_i[offs[d]:offs[d + 1]]])
                )
                for d in range(batch.num_rows)
            ],
            dtype=np.float64,
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "y": batch.column("y"),
                "score_micro": pa.array(
                    np.rint(p * SCORE_SCALE).astype(np.int64), pa.int64()
                ),
            }
        )

    return feat_ds.map_batches(score, batch_format="pyarrow")


def quality_classifier_scores(docs_ds, *, dim: int = DIM,
                              lam: float = 1e-4, iters: int = 6,
                              threshold: float = 0.06,
                              sample_frac: float | None = None,
                              seed: int = 7):
    """documents -> (doc_id, y, score_micro), end to end: stopword
    label -> featurize -> IRLS -> score. With ``sample_frac`` training
    sees only a deterministic doc_id-hash subsample (100-TB posture);
    scoring always streams the full corpus."""
    feat = featurize(
        add_stopword_label(docs_ds, threshold=threshold), dim=dim
    )
    train = feat
    if sample_frac is not None:
        from webindex.util import stable_hash64

        lim = int(sample_frac * 2**63)

        def keep(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            mask = pa.array(
                [stable_hash64(f"qc:{seed}:{i}") % 2**63 < lim
                 for i in ids]
            )
            return batch.filter(mask)

        train = feat.map_batches(keep, batch_format="pyarrow")
    w = train_quality_classifier(train, dim=dim, lam=lam, iters=iters)
    return score_quality(feat, w, dim=dim)
