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
- build       : checkpointed index-build pipeline (tokenize -> stats ->
                df -> salted groupby(term) -> encoded segments)
- search      : SegmentSearcher actor pool; block-max WAND top-k
- eval        : IR metrics (NDCG/MAP/Recall/P/MRR) over runs x qrels
- oracle      : single-threaded pure-Python BM25 oracle for tests
- dedup/ann/textstats/multimodal : training-data pipeline operators
"""

from webindex.config import AnalyzerConfig, IndexConfig

__all__ = ["AnalyzerConfig", "IndexConfig"]
__version__ = "0.1.0"
