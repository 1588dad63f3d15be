"""Single-threaded pure-Python BM25 oracle (tests only).

Template: the reference's chunked-vs-brute-force oracle test
(/root/reference/biencoder/nli_msmarco/sentence-transformers/tests/
test_util.py:33-53). Shares the pinned analyzer and scoring spec with the
engine; everything else (index, scoring loop) is an independent dict-based
implementation, so rank/score agreement is a real check.
"""

from __future__ import annotations

import math

from webindex.analyze import Analyzer
from webindex.config import IndexConfig


class OracleBM25:
    def __init__(self, corpus: list[tuple[int, str]], cfg: IndexConfig | None = None):
        self.cfg = cfg or IndexConfig()
        self.an = Analyzer(self.cfg.analyzer)
        self.postings: dict[str, dict[int, int]] = {}
        self.dl: dict[int, int] = {}
        for doc_id, text in corpus:
            tfs = self.an.term_freqs(text or "")
            self.dl[doc_id] = sum(tfs.values())
            for t, f in tfs.items():
                self.postings.setdefault(t, {})[doc_id] = f
        self.N = len(self.dl)
        self.avgdl = sum(self.dl.values()) / max(1, self.N)

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def idf(self, term: str) -> float:
        df = self.df(term)
        return math.log(1.0 + (self.N - df + 0.5) / (df + 0.5))

    def contribs(self, term: str) -> dict[int, float]:
        """Per-doc BM25 contribution of one term (idf * tf_norm)."""
        plist = self.postings.get(term)
        if not plist:
            return {}
        idf_t = self.idf(term)
        cfg = self.cfg
        out = {}
        for doc_id, tf in plist.items():
            dl = self.dl[doc_id]
            denom = tf + cfg.k1 * (1.0 - cfg.b + cfg.b * (dl / self.avgdl))
            out[doc_id] = idf_t * (tf / denom)
        return out

    def topk(self, query: str, k: int) -> list[tuple[int, float]]:
        """[(doc_id, score)] by (score desc, docID asc); fixed-order sums."""
        terms = sorted(set(self.an.tokens(query)))
        scores: dict[int, float] = {}
        cfg = self.cfg
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            idf_t = self.idf(t)
            for doc_id, tf in plist.items():
                dl = self.dl[doc_id]
                denom = tf + cfg.k1 * (1.0 - cfg.b + cfg.b * (dl / self.avgdl))
                scores[doc_id] = scores.get(doc_id, 0.0) + idf_t * (tf / denom)
        ranked = sorted(scores.items(), key=lambda e: (-e[1], e[0]))
        return ranked[:k]
