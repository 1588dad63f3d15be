from webindex.pipelines.corpus import (
    corpus_from_documents,
    prepare_corpus_from_pages,
)

__all__ = ["corpus_from_documents", "prepare_corpus_from_pages"]
