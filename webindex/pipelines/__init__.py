from webindex.pipelines.corpus import (
    corpus_from_documents,
    prepare_corpus_from_pages,
)
from webindex.pipelines.bm25 import BM25RunResult, run_bm25

__all__ = [
    "BM25RunResult",
    "corpus_from_documents",
    "prepare_corpus_from_pages",
    "run_bm25",
]
