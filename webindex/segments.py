"""Index artifact reader: dictionary, doclens, encoded posting segments.

The query-side analog of the reference's server-side ES index (SURVEY.md
§2.3 T4): a ``SegmentReader`` holds the hot dictionary + stats in memory,
loads term-bucket segment files lazily, and LRU-caches decoded posting
lists. At cluster scale each searcher actor would own a subset of buckets
(or memory-map them); on one node the reader simply page-caches the parquet.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from dataclasses import dataclass

import numpy as np
import pyarrow.dataset as pads

from webindex.compress import varbyte_decode
from webindex.config import IndexConfig
from webindex.scoring import idf as _idf
from webindex.util import read_json, term_bucket


@dataclass
class PostingList:
    """Decoded posting list: globally docID-sorted with block-max skip data."""

    term: str
    df: int
    idf: float
    ids: np.ndarray          # int64, ascending
    tfs: np.ndarray          # int64
    block_starts: np.ndarray  # int64 index into ids, one per block
    block_last: np.ndarray    # int64 last docID per block
    block_max: np.ndarray     # float64 max BM25 contribution per block
    max_score: float          # max over blocks (WAND term upper bound)
    # query-independent dense-scoring cache (doclen-table positions and
    # per-posting BM25 contribution), filled lazily by exhaustive_topk
    dense_pos: np.ndarray | None = None
    dense_contrib: np.ndarray | None = None
    # positional index (store_positions builds): raw per-block blobs at
    # load; decoded lazily by SegmentReader.positions() into a flat
    # absolute-position array + per-posting end offsets
    pos_blocks: list | None = None
    pos_vals: np.ndarray | None = None
    pos_ends: np.ndarray | None = None


class SegmentReader:
    def __init__(self, index_dir: str, postings_cache: int = 4096,
                 doc_id_range: tuple[int, int] | None = None):
        """``doc_id_range=(lo, hi)`` restricts the resident doclen table
        (and thus dense-scoring array sizes) to that inclusive docID range
        — the shard-searcher memory bound (webindex.serve): per-actor
        memory scales with its shard, not the corpus. N/avgdl/df stay
        global (scoring is corpus-global BM25 regardless of sharding)."""
        self.dir = index_dir
        self.cfg = IndexConfig.from_dict(read_json(os.path.join(index_dir, "config.json")))
        self.stats = read_json(os.path.join(index_dir, "stats.json"))
        self.N = self.stats["N"]
        self.avgdl = self.stats["avgdl"]
        # dfs_query_then_fetch (webindex.rollover): cross-index-merged
        # statistics override the local ones; see set_stats_override
        self._df_override: dict[str, int] | None = None
        self._stats_override_key = None
        # doclens: kind=1 rows of postings_raw (predicate pushdown at the
        # read); parallel sorted arrays for searchsorted lookup
        dl_filter = pads.field("kind") == 1
        if doc_id_range is not None:
            lo, hi = doc_id_range
            dl_filter = (
                dl_filter
                & (pads.field("doc_id") >= lo)
                & (pads.field("doc_id") <= hi)
            )
        dl_tab = pads.dataset(os.path.join(index_dir, "postings_raw")).to_table(
            columns=["doc_id", "dl"], filter=dl_filter
        )
        order = np.argsort(dl_tab.column("doc_id").to_numpy(), kind="stable")
        self._dl_ids = dl_tab.column("doc_id").to_numpy()[order]
        self._dl = dl_tab.column("dl").to_numpy().astype(np.int64)[order]
        # dictionary, loaded whole (small vs postings); per-bucket lazy load
        # is the scale path — kept simple here because dict rows ~ vocab size
        d_tab = pads.dataset(os.path.join(index_dir, "dict")).to_table(
            columns=["term", "df", "cf"]
        )
        self._df = dict(
            zip(d_tab.column("term").to_pylist(),
                zip(d_tab.column("df").to_pylist(), d_tab.column("cf").to_pylist()))
        )
        self._seg_root = os.path.join(index_dir, "segments")
        self._doc_id_range = doc_id_range
        self._dv: dict[str, tuple] = {}      # docvalues col -> (arr, valid)
        self._dv_masks: dict[str, np.ndarray] = {}  # pred key -> bitset
        self._seg_dset = None  # lazy pyarrow dataset handle
        self._term_span = None  # preload(): term -> (row_start, row_end)
        self._bucket_cache: dict[int, dict[str, list]] = {}
        self._postings: OrderedDict[str, PostingList] = OrderedDict()
        self._postings_cap = postings_cache
        self._live: np.ndarray | None = None  # live_mask() cache
        self._live_key: int | None = None

    # -- doclens -----------------------------------------------------------
    def doclen(self, doc_ids: np.ndarray) -> np.ndarray:
        if doc_ids.size == 0:
            return np.empty(0, dtype=self._dl.dtype)
        pos = np.searchsorted(self._dl_ids, doc_ids)
        pos = np.minimum(pos, max(self._dl_ids.size - 1, 0))
        # a doc_id outside the resident doclen table means postings and
        # doclens were loaded with mismatched filters — fail loudly rather
        # than silently scoring with a neighbor's length
        if self._dl_ids.size == 0 or not np.array_equal(
            self._dl_ids[pos], doc_ids
        ):
            missing = doc_ids[
                (self._dl_ids[pos] != doc_ids)
                if self._dl_ids.size
                else slice(None)
            ]
            raise KeyError(
                f"doclen lookup miss for {missing[:5].tolist()} "
                "(postings/doclen load filters disagree)"
            )
        return self._dl[pos]

    def doc_count(self) -> int:
        return self.N

    # -- docvalues (per-doc attribute columns for filtered search) ----------
    def _load_docvalues(self, cols: list[str]) -> None:
        """Load docvalues columns aligned positionally to ``_dl_ids`` (the
        Lucene-docvalues analog: one attribute value per resident doc slot,
        written by ``build_index(..., docvalues_ds=...)``). Restricted to
        the reader's docID range, so a shard searcher's docvalues memory is
        bounded by its shard like everything else resident."""
        import pyarrow as pa

        missing = [c for c in dict.fromkeys(cols) if c not in self._dv]
        if not missing:
            return
        root = os.path.join(self.dir, "docvalues")
        if not os.path.isdir(root):
            raise FileNotFoundError(
                f"index {self.dir} has no docvalues sidecar; rebuild with "
                "build_index(..., docvalues_ds=...) to enable filtered "
                "search"
            )
        filt = None
        if self._doc_id_range is not None:
            lo, hi = self._doc_id_range
            filt = (pads.field("doc_id") >= lo) & (pads.field("doc_id") <= hi)
        # use_threads=False: pyarrow scanner threads ignore Ray CPU
        # accounting (CLAUDE.md), and this load runs inside shard tasks
        tab = pads.dataset(root).to_table(
            columns=["doc_id"] + missing, filter=filt, use_threads=False
        )
        ids = tab.column("doc_id").to_numpy()
        if ids.size == 0:
            # no docvalues in this reader's docID range (e.g. a sparse
            # sidecar + a shard whose range it doesn't cover): every doc
            # is simply non-matching, not an error
            none = np.zeros(self._dl_ids.size, dtype=bool)
            for c in missing:
                self._dv[c] = (
                    pa.nulls(self._dl_ids.size, tab.schema.field(c).type),
                    none,
                )
            return
        order = np.argsort(ids, kind="stable")
        ids_s = ids[order]
        pos = np.searchsorted(ids_s, self._dl_ids)
        pos_c = np.minimum(pos, ids_s.size - 1)
        valid = ids_s[pos_c] == self._dl_ids
        take = pa.array(order[pos_c], pa.int64())
        for c in missing:
            # rows without a docvalue are masked out by `valid` at
            # predicate evaluation (a doc with no attributes never matches)
            self._dv[c] = (
                tab.column(c).combine_chunks().take(take), valid
            )

    def filter_mask(self, pred) -> np.ndarray:
        """Evaluate a conjunctive docvalues predicate into a bool bitset
        aligned to the doclen table (one evaluation per distinct predicate,
        cached — the query path indexes it by dense doc position).

        ``pred`` is a tuple of ``(col, op, value)`` clauses, op in
        {==, !=, <, <=, >, >=, in} ("in" takes a tuple of values)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        key = repr(pred)
        cached = self._dv_masks.get(key)
        if cached is not None:
            return cached
        self._load_docvalues([c for c, _, _ in pred])
        mask = np.ones(self._dl_ids.size, dtype=bool)
        ops = {
            "==": pc.equal, "!=": pc.not_equal, "<": pc.less,
            "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal,
        }
        for col, op, val in pred:
            arr, valid = self._dv[col]
            if op == "exists":
                # ES exists query: docvalue present (val ignored)
                mask &= valid
                continue
            if op == "missing":
                # ES missing/must_not-exists: docvalue absent
                mask &= ~valid
                continue
            if op == "in":
                r = pc.is_in(arr, value_set=pa.array(list(val), arr.type))
            elif op in ops:
                r = ops[op](arr, pa.scalar(val, arr.type))
            else:
                raise ValueError(f"filter_mask: unknown op {op!r}")
            rb = pc.fill_null(r, False).to_numpy(zero_copy_only=False)
            mask &= rb.astype(bool) & valid
        self._dv_masks[key] = mask
        return mask

    # -- deletes (tombstone sidecar, webindex.lifecycle) ---------------------
    def live_mask(self) -> np.ndarray | None:
        """Bool bitset aligned to the doclen table: True = not tombstoned.
        ``None`` when the index has no ``deletes/`` sidecar (the common
        case — zero per-query cost). Cached; re-read when the sidecar
        directory's mtime changes (``delete_docs`` renames a new tombstone
        file into it), so a live searcher observes new deletes without
        re-preloading segments. Lucene liveDocs analog: deleted docs stay
        in the postings (df/avgdl unchanged) until compaction rewrites
        the index."""
        root = os.path.join(self.dir, "deletes")
        try:
            key = os.stat(root).st_mtime_ns
        except FileNotFoundError:
            return None
        if self._live is not None and self._live_key == key:
            return self._live
        tab = pads.dataset(root).to_table(
            columns=["doc_id"], use_threads=False
        )
        dels = np.unique(tab.column("doc_id").to_numpy())
        mask = np.ones(self._dl_ids.size, dtype=bool)
        if dels.size and self._dl_ids.size:
            pos = np.searchsorted(self._dl_ids, dels)
            ok = pos < self._dl_ids.size
            pos, d = pos[ok], dels[ok]
            hit = self._dl_ids[pos] == d
            mask[pos[hit]] = False
        self._live, self._live_key = mask, key
        return mask

    # -- dictionary --------------------------------------------------------
    def df(self, term: str) -> int:
        e = self._df.get(term)
        return e[0] if e else 0

    def cf(self, term: str) -> int:
        e = self._df.get(term)
        return e[1] if e else 0

    # -- postings ----------------------------------------------------------
    def preload(self, table=None) -> None:
        """Make the segment metadata resident (the reference's
        always-resident ES index, SURVEY.md §2.3 T4). One C++ sort +
        dictionary-encode builds a term -> row-span index over the whole
        table; per-term block data converts lazily at first access (no
        Python pass over every block row). Pass ``table`` (e.g. an
        object-store-shared Arrow table, possibly salt-filtered by a shard
        searcher) to skip the disk read entirely — lookups never fall back
        to disk afterwards."""
        import pyarrow.compute as pc

        if table is None:
            if not os.path.isdir(self._seg_root):
                return
            if self._seg_dset is None:
                self._seg_dset = pads.dataset(self._seg_root)
            tab = self._seg_dset.to_table()
        else:
            tab = table
        order = pc.sort_indices(
            tab,
            sort_keys=[("term", "ascending"), ("salt", "ascending"),
                       ("block_id", "ascending")],
        )
        tab = tab.take(order).combine_chunks()
        codes = pc.dictionary_encode(
            tab.column("term").combine_chunks()
        ).indices.to_numpy()
        if codes.size:
            change = np.empty(codes.size, dtype=bool)
            change[0] = True
            change[1:] = codes[1:] != codes[:-1]
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], codes.size)
            term_col = tab.column("term")
            self._term_span = {
                term_col[int(s)].as_py(): (int(s), int(e))
                for s, e in zip(starts, ends)
            }
        else:
            self._term_span = {}
        self._seg_ns = tab.column("n").to_numpy()
        self._seg_lasts = tab.column("last_doc_id").to_numpy()
        self._seg_maxes = tab.column("max_tf_norm").to_numpy()
        self._seg_idbufs = tab.column("doc_ids").combine_chunks()
        self._seg_tfbufs = tab.column("tfs").combine_chunks()
        self._seg_posbufs = (
            tab.column("positions").combine_chunks()
            if "positions" in tab.column_names
            else None
        )

    def _fill_bucket_cache(self, tab, rows) -> None:
        terms = tab.column("term").to_pylist()
        salts = tab.column("salt").to_numpy()
        bids = tab.column("block_id").to_numpy()
        ns = tab.column("n").to_numpy()
        lasts = tab.column("last_doc_id").to_numpy()
        idbufs = tab.column("doc_ids").to_pylist()
        tfbufs = tab.column("tfs").to_pylist()
        posbufs = (
            tab.column("positions").to_pylist()
            if "positions" in tab.column_names
            else [None] * len(terms)
        )
        # idf-free per-block bounds; idf(df) is applied at load
        maxes = tab.column("max_tf_norm").to_numpy()
        for i, t in enumerate(terms):
            rows.setdefault(t, []).append(
                (int(salts[i]), int(bids[i]), int(ns[i]), int(lasts[i]),
                 idbufs[i], tfbufs[i], float(maxes[i]), posbufs[i])
            )

    def _load_bucket(self, bucket: int) -> dict[str, list]:
        cached = self._bucket_cache.get(bucket)
        if cached is not None:
            return cached
        rows: dict[str, list] = {}
        if os.path.isdir(self._seg_root):
            if self._seg_dset is None:
                self._seg_dset = pads.dataset(self._seg_root)
            tab = self._seg_dset.to_table(
                filter=pads.field("bucket") == bucket
            )
            self._fill_bucket_cache(tab, rows)
        self._bucket_cache[bucket] = rows
        return rows

    def set_stats_override(self, stats: dict | None):
        """Swap in cross-index-merged statistics (the ES
        ``dfs_query_then_fetch`` phase, webindex.rollover): ``stats`` is
        ``{"N": int, "avgdl": float, "dfs": {term: global_df}}`` or None
        to restore the index-local values. Resident posting lists bake
        idf and block-max bounds, so a CHANGE of override drops the
        postings cache (no-op when the key is unchanged — cached shard
        searchers serve repeat msearch calls warm)."""
        key = None
        if stats is not None:
            key = (
                int(stats["N"]), float(stats["avgdl"]),
                tuple(sorted(stats.get("dfs", {}).items())),
            )
        if key == self._stats_override_key:
            return False
        self._stats_override_key = key
        self._postings.clear()
        # contribution-lookup tables bake contributions too; drop their
        # LRU so stale PostingList references don't pin memory, and the
        # strike/backoff records with it — old-stats backoff levels (or
        # "none" overflow markers) are meaningless under new
        # contributions and would wrongly defer or forbid rebuilds
        if getattr(self, "_contrib_lut_lru", None):
            self._contrib_lut_lru.clear()
        if getattr(self, "_lut_strikes", None):
            self._lut_strikes.clear()
        if stats is None:
            self.N = self.stats["N"]
            self.avgdl = self.stats["avgdl"]
            self._df_override = None
        else:
            self.N = int(stats["N"])
            self.avgdl = float(stats["avgdl"])
            self._df_override = dict(stats.get("dfs", {}))
        return True

    def postings(self, term: str) -> PostingList | None:
        pl = self._postings.get(term)
        if pl is not None:
            self._postings.move_to_end(term)
            return pl
        dfe = self._df.get(term)
        if dfe is None:
            return None
        if self._term_span is not None:
            span = self._term_span.get(term)
            if span is None:
                return None
            s, e = span
            ns = self._seg_ns[s:e].astype(np.int64)
            lasts = self._seg_lasts[s:e].astype(np.int64)
            maxes = self._seg_maxes[s:e].astype(np.float64)
            idbufs = self._seg_idbufs.slice(s, e - s).to_pylist()
            tfbufs = self._seg_tfbufs.slice(s, e - s).to_pylist()
            posbufs = (
                self._seg_posbufs.slice(s, e - s).to_pylist()
                if self._seg_posbufs is not None
                else None
            )
        else:
            blocks = self._load_bucket(
                term_bucket(term, self.cfg.num_buckets)
            ).get(term)
            if not blocks:
                return None
            # (salt, block_id) order == ascending docID ranges (range
            # salting)
            blocks.sort(key=lambda r: (r[0], r[1]))
            ns = np.array([b[2] for b in blocks], dtype=np.int64)
            lasts = np.array([b[3] for b in blocks], dtype=np.int64)
            maxes = np.array([b[6] for b in blocks], dtype=np.float64)
            idbufs = [b[4] for b in blocks]
            tfbufs = [b[5] for b in blocks]
            posbufs = (
                [b[7] for b in blocks] if blocks[0][7] is not None else None
            )
        starts = np.concatenate(([0], np.cumsum(ns)[:-1]))
        if getattr(self.cfg, "codec", "varbyte") == "ef":
            # EF blocks are self-contained absolute ids (per-block decode,
            # vectorized within — the documented space-profile tradeoff)
            from webindex.compress import ef_decode_concat

            ids = ef_decode_concat(idbufs, ns)
        else:
            # joint decode: ONE varbyte pass over the concatenated buffers
            # (a per-block decode loop cost ~50us x thousands of
            # 128-posting blocks on stopword-scale lists), then a
            # segmented cumsum turns block-local gaps into absolute docIDs
            # (each block's first value is stored absolute)
            gaps = varbyte_decode(b"".join(idbufs))
            csum = np.cumsum(gaps)
            shift = np.zeros(ns.size, dtype=np.int64)
            shift[1:] = csum[starts[1:] - 1]
            ids = csum - np.repeat(shift, ns)
        tfs = varbyte_decode(b"".join(tfbufs))
        df_eff = dfe[0]
        if self._df_override is not None:
            df_eff = self._df_override.get(term, df_eff)
        idf_t = _idf(self.N, df_eff)
        block_max = idf_t * maxes
        if self._df_override is not None:
            # stored per-block max_tf_norm was computed with the LOCAL
            # avgdl; under a larger global avgdl tf_norm grows by at most
            # avgdl_g/avgdl_l (denominator shrink is bounded by the
            # dl-term shrink), so scale the bound to stay a valid upper
            # bound — pruning stays exact, only marginally looser
            ratio = self.avgdl / self.stats["avgdl"]
            if ratio > 1.0:
                block_max = block_max * ratio
        pl = PostingList(
            term=term,
            df=df_eff,
            idf=idf_t,
            ids=ids,
            tfs=tfs,
            block_starts=starts,
            block_last=lasts,
            block_max=block_max,
            max_score=float(block_max.max()),
            pos_blocks=posbufs,
        )
        self._postings[term] = pl
        if len(self._postings) > self._postings_cap:
            self._postings.popitem(last=False)
        return pl

    def positions(self, term: str) -> tuple[np.ndarray, np.ndarray] | None:
        """Decoded term positions: ``(pos_vals, pos_ends)`` where posting
        ``i``'s positions are ``pos_vals[pos_ends[i]-tfs[i] : pos_ends[i]]``
        (ascending, absolute). One joint varbyte pass + segmented cumsum
        over the per-posting delta runs (tf values each — the tfs ARE the
        offsets, the positional index stores no extra metadata). None when
        the index was built without ``store_positions``. Decoded once per
        resident posting list."""
        pl = self.postings(term)
        if pl is None or pl.pos_blocks is None:
            return None
        if pl.pos_vals is None:
            gaps = varbyte_decode(b"".join(pl.pos_blocks))
            tfs = pl.tfs.astype(np.int64)
            ends = np.cumsum(tfs)
            starts = ends - tfs
            csum = np.cumsum(gaps)
            shift = np.zeros(tfs.size, dtype=np.int64)
            shift[1:] = csum[starts[1:] - 1]
            pl.pos_vals = csum - np.repeat(shift, tfs)
            pl.pos_ends = ends
        return pl.pos_vals, pl.pos_ends


def _decode_ids(buf: bytes, n: int) -> np.ndarray:
    gaps = varbyte_decode(buf)
    assert gaps.size == n
    return np.cumsum(gaps)
