"""Pinned configuration for the BM25 engine.

The BM25 parameters are the north-rule override (k1=0.9, b=0.4) of the
reference's Elasticsearch 7.0.0 defaults (reference invocation:
crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10; see SURVEY.md §7.0).
Everything here is part of the engine *spec*: the single-threaded oracle in
webindex/oracle.py consumes the same config so that rank-identity is
well-defined.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict


@dataclass(frozen=True)
class AnalyzerConfig:
    """Text-analysis chain: NFC -> lowercase -> regex tokenize -> stopword
    filter -> Porter stem.

    ``ascii_only`` switches the token pattern to ``[a-z0-9]+`` over the
    lowercased text — used by the no-stem analyzer variant whose results are
    checked against a pure-SQL DuckDB oracle (DuckDB regexp semantics are
    ASCII-friendly), and cheap at web scale.
    """

    lowercase: bool = True
    remove_stopwords: bool = True
    stem: bool = True
    ascii_only: bool = False
    min_token_len: int = 1
    max_token_len: int = 64
    # index-time synonym injection (the ES synonym token-filter analog):
    # ((term, (syn, ...)), ...) — each analyzed token additionally emits
    # its mapped synonyms, appended verbatim after the stream (they bypass
    # the stopword/stem filters and COUNT toward doclen; pinned spec the
    # SQL oracle replays). Incompatible with store_positions (appended
    # tokens would take tail positions, not Lucene's same-position
    # semantics — build_index refuses the combination).
    synonyms: tuple = ()
    # Lucene index_phrases analog: the token stream becomes its word
    # BIGRAMS (space-joined — analyzed tokens cannot contain spaces, so
    # shingle terms never collide with unigrams). A shingle index is a
    # MATCHING accelerator for exact two-word phrases (the bigram term
    # exists in a doc iff the adjacency occurs); scoring stays on the
    # main index. Like Lucene's ._index_phrase subfield, it is a
    # separate index, so main-field statistics are untouched.
    shingle_only: bool = False

    def __post_init__(self):
        # normalize (e.g. JSON-roundtripped lists) to nested tuples so the
        # frozen config stays hashable and cache_key is stable
        object.__setattr__(
            self, "synonyms",
            tuple((str(t), tuple(s)) for t, s in self.synonyms),
        )

    def cache_key(self) -> str:
        return "-".join(f"{k}={v}" for k, v in sorted(asdict(self).items()))


# Analyzer used when results must be reproducible by an ANSI-SQL oracle
# (no stemming / stopwords, ASCII tokens only).
SQL_SAFE_ANALYZER = AnalyzerConfig(
    remove_stopwords=False, stem=False, ascii_only=True
)


@dataclass(frozen=True)
class IndexConfig:
    """Index build + query configuration.

    - ``k1``/``b``: BM25 parameters (north rule).
    - ``block_size``: postings per block-max block (skip granularity).
    - ``num_buckets``: term-hash buckets; segments + dictionary are
      partitioned by bucket so query actors can prune reads and a resumed
      build can skip finished buckets.
    - ``n_parts``: encode partitions. The posting shuffle is physical files:
      stage 1 writes postings hive-partitioned by
      ``pkey = hash(term, salt) % n_parts`` and stage 4 encodes each
      partition independently — no Ray-level sort of posting rows at all.
    - ``salt_doc_shift`` / ``shards_per_salt``: EVERY term's posting rows
      carry ``salt = (doc_id >> salt_doc_shift) // shards_per_salt`` — the
      docID's shard prefix (webindex.docids packs ``shard << 40 | rank``),
      so salts are contiguous docID *ranges*. Stopword-scale terms
      (df ~ N) therefore split across up to num_shards/shards_per_salt
      partitions with no df pre-pass, and the per-salt encoded runs
      concatenate into a globally docID-sorted posting list with no
      secondary re-sort (SURVEY.md §7.3 "Term skew"). Small corpora with
      plain ids (< 2^40) get salt 0 everywhere — one run per term.
    - ``df_salt_threshold``: retained as a lineage metric (terms above it
      are listed in heavy_terms.json for skew observability).
    """

    k1: float = 0.9
    b: float = 0.4
    block_size: int = 128
    num_buckets: int = 32
    df_salt_threshold: int = 50_000
    salt_shards: int = 32
    n_parts: int = 32
    n_write_blocks: int = 32
    salt_doc_shift: int = 40
    shards_per_salt: int = 2
    top_k: int = 1000
    # store term positions in the postings (Lucene
    # IndexOptions.DOCS_AND_FREQS_AND_POSITIONS analog): enables index-only
    # phrase queries (webindex.positional) at ~cf/df x the posting bytes.
    # Off by default — web-scale match/rank workloads rarely need them and
    # the position-free engine answers phrases by lazy verification
    # (webindex.phrase).
    store_positions: bool = False
    # docID-stream codec: "varbyte" (delta+LEB128, byte-sliceable whole-run
    # encode, joint concat decode — the latency default) or "ef"
    # (Elias-Fano per block: ~n*(2+log2(u/n)) bits, wins once average gaps
    # drop under ~64 — the space profile; tf/position streams stay varbyte
    # in both). Proven rank-identical in tests/test_compress.py.
    codec: str = "varbyte"
    analyzer: AnalyzerConfig = field(default_factory=AnalyzerConfig)

    def to_dict(self) -> dict:
        return asdict(self)

    @staticmethod
    def from_dict(d: dict) -> "IndexConfig":
        d = dict(d)
        d["analyzer"] = AnalyzerConfig(**d.get("analyzer", {}))
        return IndexConfig(**d)
