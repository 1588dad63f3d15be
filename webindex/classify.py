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


_DOC_MARKER = "#doc"  # '#' can never appear in an [a-z0-9]+ token


def naive_bayes_scores(docs_ds, *, threshold: float = 0.06,
                       n_parts: int = 64):
    """Multinomial Naive Bayes quality classifier (Laplace alpha=1) —
    the closed-form sibling of the IRLS filter, and the SQL-checkable
    one: training is pure counting, so the whole train+score pipeline
    has a DuckDB oracle (``naive_bayes_sql``).

    Per doc with >= 1 token: ``llr = ln(N1/N0) + sum over distinct
    terms (ascending) of tf * w_term`` where ``w_term =
    ln((cf1+1)/(T1+V)) - ln((cf0+1)/(T0+V))`` — cf_c = class token
    count of the term, T_c = class total tokens, V = corpus vocabulary
    size, N_c = class doc count. All counts exact int64; each ln is
    SCALAR math.log per distinct value (bit-equal to DuckDB ln,
    measured repo invariant); the per-doc fold is term-sorted reduceat
    and the contract surface rounds to 6dp (unigram_logprob precedent —
    fold order is engine-specific). Output: (doc_id, y, n_tokens,
    llr_r, pred) with pred = 1 iff the ROUNDED llr > 0 (both engines
    decide on the same rounded value).

    Scale shape (mirrors textstats.unigram_logprob): ONE term-hash
    shuffle for per-class cf (marker rows ride along to count class
    docs — no extra pass), vocab-sized weight table computed in place,
    one padded-union hash join of weights back onto the (doc, term, tf)
    rows, one doc-hash shuffle for the fold. Nothing corpus-sized
    touches the driver; the driver holds 5 scalars."""
    import math

    import pandas as pd

    from webindex.relational import hash_join_attach, hash_partitioned_groupby
    from webindex.textstats import _ASCII_TOK_RE
    from webindex.analyze import LUCENE_STOPWORDS

    def explode(batch: pa.Table) -> pa.Table:
        from collections import Counter

        o_id, o_y, o_t, o_tf = [], [], [], []
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            toks = _ASCII_TOK_RE.findall((t or "").lower())
            if not toks:
                continue
            sw = sum(1 for w in toks if w in LUCENE_STOPWORDS)
            y = 1 if sw / len(toks) >= threshold else 0
            tfs = Counter(toks)
            for term, f in tfs.items():
                o_id.append(did)
                o_y.append(y)
                o_t.append(term)
                o_tf.append(f)
            o_id.append(did)  # marker: counts class DOCS through the
            o_y.append(y)     # same cf shuffle (tf=1, dropped at join)
            o_t.append(_DOC_MARKER)
            o_tf.append(1)
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "y": pa.array(o_y, pa.int64()),
                "term": pa.array(o_t, pa.string()),
                "tf": pa.array(o_tf, pa.int64()),
            }
        )

    rows = docs_ds.map_batches(explode, batch_format="pyarrow").materialize()

    def cf_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["term", "y"], sort=False)["tf"].sum().reset_index()
        return g

    def cf_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["term", "y"], sort=False)["tf"].sum().reset_index()
        p = g.pivot_table(index="term", columns="y", values="tf",
                          aggfunc="sum", fill_value=0)
        out = pd.DataFrame({"term": p.index.to_numpy()})
        out["cf1"] = (p[1].to_numpy(np.int64) if 1 in p.columns
                      else np.zeros(len(p), np.int64))
        out["cf0"] = (p[0].to_numpy(np.int64) if 0 in p.columns
                      else np.zeros(len(p), np.int64))
        return out

    cf_ds = hash_partitioned_groupby(
        rows, ["term"], cf_partial, cf_final, n_parts=n_parts
    ).materialize()

    # driver scalars: marker row -> class doc counts; rest -> totals
    def only_marker(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.equal(batch.column("term"), _DOC_MARKER))

    mark = cf_ds.map_batches(
        only_marker, batch_format="pyarrow"
    ).take_all()
    n1 = int(mark[0]["cf1"]) if mark else 0
    n0 = int(mark[0]["cf0"]) if mark else 0
    if n1 == 0 or n0 == 0:
        raise ValueError(
            f"naive_bayes_scores: degenerate training set (N1={n1}, "
            f"N0={n0}); both classes must be present"
        )
    v = cf_ds.count() - 1
    t1 = int(cf_ds.sum("cf1")) - n1
    t0 = int(cf_ds.sum("cf0")) - n0

    def weights(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(
            pc.not_equal(batch.column("term"), _DOC_MARKER)
        )
        w = [
            math.log((c1 + 1) / (t1 + v)) - math.log((c0 + 1) / (t0 + v))
            for c1, c0 in zip(batch.column("cf1").to_pylist(),
                              batch.column("cf0").to_pylist())
        ]
        return pa.table(
            {
                "term": batch.column("term"),
                "w": pa.array(w, pa.float64()),
            }
        )

    w_ds = cf_ds.map_batches(weights, batch_format="pyarrow")

    joined = hash_join_attach(
        rows, "term", w_ds, ["w"],
        rows_types={"doc_id": pa.int64(), "y": pa.int64(),
                    "term": pa.string(), "tf": pa.int64()},
        val_types={"w": pa.float64()},
        n_parts=n_parts,
    )

    prior = math.log(n1 / n0)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "term"],
                            kind="mergesort").reset_index(drop=True)
        ids = df["doc_id"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        contrib = (df["tf"].to_numpy(np.float64)
                   * df["w"].to_numpy(np.float64))
        lp = np.add.reduceat(contrib, starts)
        nt = np.add.reduceat(df["tf"].to_numpy(np.int64), starts)
        llr_r = np.round(prior + lp, 6)
        return pd.DataFrame(
            {
                "doc_id": ids[starts],
                "y": df["y"].to_numpy(np.int64)[starts],
                "n_tokens": nt,
                "llr_r": llr_r,
                "pred": (llr_r > 0).astype(np.int64),
            }
        )

    def fold_final(df: pd.DataFrame) -> pd.DataFrame:
        if df["doc_id"].duplicated().any():
            raise AssertionError(
                "naive_bayes_scores: a doc's rows were split before the "
                "term-sorted fold (pinned summation order violated)"
            )
        return df

    return hash_partitioned_groupby(
        joined, ["doc_id"], lambda df: df,
        lambda df: fold_final(fold(df)), n_parts=n_parts,
    )


def naive_bayes_sql(*, threshold: float = 0.06,
                    stoplist_sql: str = "") -> str:
    """DuckDB mirror of naive_bayes_scores (same token stream, same
    smoothing, same rounded surface). ``stoplist_sql`` is the quoted
    comma-separated Lucene stopword list (caller supplies it so this
    module stays SQL-engine-agnostic)."""
    return f"""
WITH base AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tl
  FROM documents
),
lab AS (
  SELECT doc_id, tl,
         CASE WHEN len(list_filter(tl, t -> t IN ({stoplist_sql})))::DOUBLE
                   / len(tl) >= {threshold} THEN 1 ELSE 0 END AS y
  FROM base WHERE len(tl) > 0
),
toks AS (SELECT doc_id, y, unnest(tl) AS term FROM lab),
tf AS (SELECT doc_id, y, term, count(*)::BIGINT AS tf
       FROM toks GROUP BY doc_id, y, term),
cf AS (SELECT term,
              coalesce(sum(tf) FILTER (y = 1), 0)::BIGINT AS cf1,
              coalesce(sum(tf) FILTER (y = 0), 0)::BIGINT AS cf0
       FROM tf GROUP BY term),
gstats AS (SELECT count(*)::BIGINT AS v, sum(cf1)::BIGINT AS t1,
                   sum(cf0)::BIGINT AS t0 FROM cf),
nd AS (SELECT count(*) FILTER (y = 1)::BIGINT AS n1,
              count(*) FILTER (y = 0)::BIGINT AS n0 FROM lab),
w AS (SELECT term,
             ln((cf1 + 1)::DOUBLE / (t1 + v))
               - ln((cf0 + 1)::DOUBLE / (t0 + v)) AS w
      FROM cf CROSS JOIN gstats),
contrib AS (SELECT tf.doc_id, tf.y, tf.term, tf.tf, tf.tf * w.w AS c
            FROM tf JOIN w ON w.term = tf.term),
agg AS (SELECT doc_id, y, sum(tf)::BIGINT AS n_tokens,
               list_sum(list(c ORDER BY term)) AS lp
        FROM contrib GROUP BY doc_id, y)
SELECT doc_id, y, n_tokens,
       round(ln(n1::DOUBLE / n0) + lp, 6) AS llr_r,
       (CASE WHEN round(ln(n1::DOUBLE / n0) + lp, 6) > 0
             THEN 1 ELSE 0 END)::BIGINT AS pred
FROM agg CROSS JOIN nd
"""


def langid_nb_scores(docs_ds, *, n_parts: int = 64):
    """Corpus-trained multiclass Naive Bayes language identifier — the
    fastText-direction upgrade of the fixed-profile heuristic
    (textstats.LangIdStage): train per-language term counts from the
    corpus's own ``lang`` labels, predict argmax class log-likelihood.
    Fully SQL-checkable (``langid_nb_sql``) — training is counting,
    every ln is scalar math.log (bit-equal to DuckDB ln, measured).

    Per labeled doc (>= 1 token): ``llh_c = ln(N_c/N) + sum over the
    doc's distinct terms (ascending) of tf * ln((cf_{t,c}+1)/(T_c+V))``
    with Laplace alpha=1 over the GLOBAL vocabulary V (absent (t, c)
    counts are 0 — the weight table is pivoted wide with fill 0, so
    every class sums over the same term set). llh rounded to 6dp at
    the surface (fold order is engine-specific, unigram_logprob
    precedent); prediction = argmax of the ROUNDED llh, ties broken by
    ascending class name — both engines decide on identical values.
    Output: (doc_id, lang, lang_pred, llh_r, correct).

    Scale shape: one bounded pass for the class list + per-class doc
    counts (per-batch partials, driver holds #classes rows), ONE
    term-hash shuffle for the per-class cf pivot (vocab-sized, never
    driver-resident), per-class totals as bounded partials, one
    padded-union hash join of the wide weight table onto the (doc,
    term, tf) rows, one doc-hash shuffle for the fold. #classes is
    assumed small (languages); each adds one float64 column."""
    import math

    import pandas as pd

    from webindex.relational import hash_join_attach, hash_partitioned_groupby
    from webindex.textstats import _ASCII_TOK_RE

    def explode(batch: pa.Table) -> pa.Table:
        from collections import Counter

        o_id, o_lang, o_t, o_tf = [], [], [], []
        for did, lang, t in zip(batch.column("doc_id").to_pylist(),
                                batch.column("lang").to_pylist(),
                                batch.column("text").to_pylist()):
            toks = _ASCII_TOK_RE.findall((t or "").lower())
            if not toks:
                continue
            for term, f in Counter(toks).items():
                o_id.append(did)
                o_lang.append(lang)
                o_t.append(term)
                o_tf.append(f)
            o_id.append(did)  # marker row: counts class docs (pass 0)
            o_lang.append(lang)
            o_t.append(_DOC_MARKER)
            o_tf.append(1)
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "lang": pa.array(o_lang, pa.string()),
                "term": pa.array(o_t, pa.string()),
                "tf": pa.array(o_tf, pa.int64()),
            }
        )

    rows = docs_ds.map_batches(explode, batch_format="pyarrow").materialize()

    # pass 0: class list + per-class doc counts (bounded: batches x classes)
    def class_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = batch.filter(pc.equal(batch.column("term"), _DOC_MARKER))
        g = m.group_by("lang").aggregate([("tf", "sum")])
        return pa.table({"lang": g.column("lang"),
                         "n": g.column("tf_sum")})

    n_by_class: dict[str, int] = {}
    for r in rows.map_batches(class_partial,
                              batch_format="pyarrow").take_all():
        n_by_class[r["lang"]] = n_by_class.get(r["lang"], 0) + int(r["n"])
    if len(n_by_class) < 2:
        raise ValueError(
            f"langid_nb_scores: need >= 2 language classes, got "
            f"{sorted(n_by_class)}"
        )
    classes = sorted(n_by_class)
    n_total = sum(n_by_class.values())

    # ONE term-hash shuffle -> wide per-class cf table (fill 0)
    def cf_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["term"] != _DOC_MARKER]
        return (df.groupby(["term", "lang"], sort=False)["tf"]
                .sum().reset_index())

    def cf_final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["term", "lang"], sort=False)["tf"]
             .sum().reset_index())
        p = g.pivot_table(index="term", columns="lang", values="tf",
                          aggfunc="sum", fill_value=0)
        out = pd.DataFrame({"term": p.index.to_numpy()})
        for c in classes:
            out["cf_" + c] = (p[c].to_numpy(np.int64) if c in p.columns
                              else np.zeros(len(p), np.int64))
        return out

    cf_ds = hash_partitioned_groupby(
        rows, ["term"], cf_partial, cf_final, n_parts=n_parts
    ).materialize()

    v = cf_ds.count()
    t_by_class = {c: int(cf_ds.sum("cf_" + c)) for c in classes}

    def weights(batch: pa.Table) -> pa.Table:
        cols = {"term": batch.column("term")}
        for c in classes:
            denom = t_by_class[c] + v
            cols["w_" + c] = pa.array(
                [math.log((cf + 1) / denom)
                 for cf in batch.column("cf_" + c).to_pylist()],
                pa.float64(),
            )
        return pa.table(cols)

    w_ds = cf_ds.map_batches(weights, batch_format="pyarrow")

    w_cols = ["w_" + c for c in classes]
    joined = hash_join_attach(
        rows, "term", w_ds, w_cols,
        rows_types={"doc_id": pa.int64(), "lang": pa.string(),
                    "term": pa.string(), "tf": pa.int64()},
        val_types={wc: pa.float64() for wc in w_cols},
        n_parts=n_parts,
    )

    priors = {c: math.log(n_by_class[c] / n_total) for c in classes}

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["term"] != _DOC_MARKER]
        df = df.sort_values(["doc_id", "term"],
                            kind="mergesort").reset_index(drop=True)
        ids = df["doc_id"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        tf = df["tf"].to_numpy(np.float64)
        llh = np.empty((len(starts), len(classes)))
        for j, c in enumerate(classes):
            contrib = tf * df["w_" + c].to_numpy(np.float64)
            llh[:, j] = np.round(priors[c] + np.add.reduceat(contrib,
                                                             starts), 6)
        # argmax of ROUNDED llh, tie-break ascending class name: classes
        # is sorted and np.argmax takes the FIRST max.
        best = np.argmax(llh, axis=1)
        langs = df["lang"].to_numpy()[starts]
        pred = np.asarray(classes, dtype=object)[best]
        return pd.DataFrame(
            {
                "doc_id": ids[starts],
                "lang": langs,
                "lang_pred": pred,
                "llh_r": llh[np.arange(len(starts)), best],
                "correct": (pred == langs).astype(np.int64),
            }
        )

    return hash_partitioned_groupby(
        joined, ["doc_id"], lambda df: df, fold, n_parts=n_parts,
    )


def langid_nb_sql() -> str:
    """DuckDB mirror of langid_nb_scores (same token stream, smoothing,
    rounding, and argmax tie-break)."""
    return """
WITH base AS (
  SELECT doc_id, lang,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS tl
  FROM documents
),
lab AS (SELECT doc_id, lang, tl FROM base WHERE len(tl) > 0),
toks AS (SELECT doc_id, lang, unnest(tl) AS term FROM lab),
tf AS (SELECT doc_id, lang, term, count(*)::BIGINT AS tf
       FROM toks GROUP BY doc_id, lang, term),
cf AS (SELECT lang, term, sum(tf)::BIGINT AS cf
       FROM tf GROUP BY lang, term),
classes AS (SELECT lang, count(*)::BIGINT AS n_docs FROM lab GROUP BY lang),
ntot AS (SELECT sum(n_docs)::BIGINT AS n FROM classes),
ts AS (SELECT c.lang, coalesce(sum(cf.cf), 0)::BIGINT AS t
       FROM classes c LEFT JOIN cf ON cf.lang = c.lang GROUP BY c.lang),
vv AS (SELECT count(DISTINCT term)::BIGINT AS v FROM cf),
pairs AS (SELECT tf.doc_id, tf.lang AS lang_true, tf.term, tf.tf,
                 c.lang AS cls
          FROM tf CROSS JOIN classes c),
contrib AS (
  SELECT p.doc_id, p.lang_true, p.cls, p.term,
         p.tf * ln((coalesce(cf.cf, 0) + 1)::DOUBLE / (ts.t + vv.v)) AS c
  FROM pairs p
  LEFT JOIN cf ON cf.lang = p.cls AND cf.term = p.term
  JOIN ts ON ts.lang = p.cls CROSS JOIN vv
),
agg AS (
  SELECT doc_id, lang_true, cls,
         round(ln(c2.n_docs::DOUBLE / n.n)
               + list_sum(list(c ORDER BY term)), 6) AS llh_r
  FROM contrib JOIN classes c2 ON c2.lang = contrib.cls CROSS JOIN ntot n
  GROUP BY doc_id, lang_true, cls, c2.n_docs, n.n
),
best AS (
  SELECT doc_id, lang_true, cls, llh_r,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY llh_r DESC, cls) AS rn
  FROM agg
)
SELECT doc_id, lang_true AS lang, cls AS lang_pred, llh_r,
       (CASE WHEN cls = lang_true THEN 1 ELSE 0 END)::BIGINT AS correct
FROM best WHERE rn = 1
"""


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
