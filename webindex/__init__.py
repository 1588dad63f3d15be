"""webindex — a Ray-Data-native full-text (BM25) indexing and retrieval engine.

Built from scratch against the behavior of the reference repo
(Muennighoff/sgpt, /root/reference): the BM25 lexical baseline that SGPT
benchmarks against on BEIR (reference invocation:
crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10), re-expressed as
idiomatic Ray Data pipelines over zero-copy Arrow batches.

Layers
------
- analyze     : pinned text analysis chain (NFC -> lower -> tokenize ->
                stopword filter -> Porter stem), shared by engine & oracle
- extract     : HTML -> text extraction (byte-identical per url)
- synth       : deterministic synthetic web-page corpus (FIXTURES.md F1-F3)
- compress    : delta + varbyte posting-list codec (numpy-vectorized)
- docids      : URL dedup + deterministic partition-independent docIDs
- build       : checkpointed index-build pipeline (tokenize -> stats ->
                dict -> per-partition encoded block-max segments; the
                posting shuffle is checkpoint-relay through pkey-sorted
                parquet, salted by docID range for term skew)
- merge       : combine indexes over disjoint docID spaces (incremental)
- search      : SegmentSearcher actor pool; WAND / MAXSCORE-pruned dense
                scoring, auto-selected per query; filtered search over the
                docvalues sidecar, AND match, faceted aggregations
- phrase      : phrase queries by lazy verification (position-free index)
- positional  : index-only phrase queries over opt-in positional postings
- snippet     : best query-coverage token window per hit (highlighter)
- serve       : doc-partitioned shard actors + exact scatter-gather merge
- eval        : IR metrics (NDCG/MAP/Recall/P/MRR) over runs x qrels
- sources     : BEIR jsonl/tsv/results-JSON readers and writers
- embed/rerank: dense-retrieval and cross-encoder parity paths
- oracle      : single-threaded pure-Python BM25 oracle for tests
- parallel    : UDF harness with log/fail error channels + retries
- pipelines   : end-to-end compositions (run_bm25, corpus prep, driver
                contract registry); CLI via ``python -m webindex``
- lexicon     : dictionary-driven query operators (suggest, fuzzy, MLT,
                synonyms, explain, termvectors)
- sketch      : exact distributed heavy hitters (certified two-pass)
- graph       : link analysis (fixed-point PageRank over edge Datasets)
- temporal/quantile : as-of & range joins, sliding windows, exact
                distributed per-group median
- dedup/ann/textstats/textutil/relational/multimodal :
                training-data pipeline operators
"""

from webindex.config import AnalyzerConfig, IndexConfig

__all__ = ["AnalyzerConfig", "IndexConfig"]
__version__ = "0.1.0"
