"""Text-analysis + multimodal stage tests."""

import numpy as np
import pyarrow as pa
import pytest

from webindex.multimodal import (
    DecodeStage,
    ResizeStage,
    _decode_fake,
    media_features,
    synth_media_table,
)
from webindex.textstats import (
    LangIdStage,
    fingerprint_batch,
    quality_batch,
    rolling_fingerprint,
    token_count_batch,
)


def _batch(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def test_langid():
    out = LangIdStage()(
        _batch(
            [
                (1, "the cat sat on the mat and it was happy with this"),
                (2, "der hund ist nicht in der küche und das ist gut"),
                (3, "el perro es un animal que vive en la casa"),
                (4, ""),
                (5, "zzz qqq xxx"),
            ]
        )
    )
    assert out.column("lang_pred").to_pylist() == ["en", "de", "es", "und", "und"]
    assert out.column("lang_conf").to_pylist()[0] > 0.3


def test_quality():
    good = "The project demonstrates a careful balance of design and code " * 10
    out = quality_batch(_batch([(1, good), (2, "3 4 5 6 7 8 9 10 11"), (3, "")]))
    q = out.column("quality").to_pylist()
    assert q[0] > 0.5
    assert q[1] < 0.2  # digit soup
    assert q[2] == 0.0
    assert out.column("n_tokens").to_pylist()[2] == 0


def test_token_count():
    out = token_count_batch(_batch([(1, "hello world, it's 42 degrees!")]))
    assert out.column("n_ws_tokens").to_pylist() == [5]
    # hello | world | , | it | 's | 42 | degrees | !
    assert out.column("n_bpeish_tokens").to_pylist() == [8]


def test_fingerprint_deterministic_and_ws_invariant():
    a = rolling_fingerprint("hello   world\n\tfoo")
    b = rolling_fingerprint("hello world foo")
    assert a == b
    assert rolling_fingerprint("hello world fop") != a
    out = fingerprint_batch(_batch([(1, "x  y"), (2, "x y")]))
    assert out.column("fp_md5").to_pylist()[0] == out.column("fp_md5").to_pylist()[1]


def test_png_roundtrip_and_filters():
    import zlib

    from webindex.multimodal import _PNG_SIG, png_decode, png_encode

    rng = np.random.default_rng(4)
    for shape in [(7, 5, 3), (4, 4, 4), (9, 3, 1)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        back = png_decode(png_encode(arr))
        assert np.array_equal(back, arr), shape
    # decoder must invert ALL five scanline filters: forward-filter a known
    # image per the PNG spec and hand-assemble the IDAT stream
    arr = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8).astype(int)
    h, w, c = arr.shape
    stride = w * c
    flat = arr.reshape(h, stride)

    def paeth(a, b, cc):
        p = a + b - cc
        pa_, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        return a if pa_ <= pb and pa_ <= pc else (b if pb <= pc else cc)

    raw = b""
    filters = [0, 1, 2, 3, 4]
    prev = np.zeros(stride, dtype=int)
    for y, f in enumerate(filters):
        line = flat[y]
        enc = np.zeros(stride, dtype=int)
        for x in range(stride):
            a = line[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                enc[x] = line[x]
            elif f == 1:
                enc[x] = (line[x] - a) & 0xFF
            elif f == 2:
                enc[x] = (line[x] - b) & 0xFF
            elif f == 3:
                enc[x] = (line[x] - ((a + b) >> 1)) & 0xFF
            else:
                enc[x] = (line[x] - paeth(a, b, cc)) & 0xFF
        raw += bytes([f]) + bytes(enc.astype(np.uint8))
        prev = line
    import struct as _s

    from webindex.multimodal import _png_chunk

    ihdr = _s.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(raw))
           + _png_chunk(b"IEND", b""))
    assert np.array_equal(png_decode(png), arr.astype(np.uint8))


def test_wav_roundtrip():
    from webindex.multimodal import wav_decode, wav_encode

    rng = np.random.default_rng(5)
    sams = rng.integers(-32768, 32767, size=(100, 2), dtype=np.int16)
    back, rate = wav_decode(wav_encode(sams, rate=8000))
    assert rate == 8000
    assert np.array_equal(back, sams)


def test_media_decode_and_resize():
    from webindex.multimodal import png_decode

    tab = synth_media_table(10)
    feats = DecodeStage()(tab)  # real codecs by default
    assert feats.num_rows == 10
    assert all(w >= 4 for w in feats.column("width").to_pylist())
    # image rows decode real PNG bytes
    img_rows = [i for i, k in enumerate(tab.column("kind").to_pylist())
                if k == "image"]
    payload = tab.column("payload").to_pylist()[img_rows[0]]
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    rz = ResizeStage(out_w=4, out_h=4)(tab.take(img_rows))
    arr = png_decode(rz.column("payload").to_pylist()[0])
    assert arr.shape == (4, 4, 3)


def test_y4m_roundtrip_c444():
    from webindex.multimodal import y4m_decode, y4m_encode

    rng = np.random.default_rng(12)
    frames = rng.integers(0, 256, size=(3, 9, 7, 3), dtype=np.uint8)
    back, fps = y4m_decode(y4m_encode(frames, fps=(30, 1)))
    assert fps == (30, 1)
    assert back.shape == frames.shape
    # container is lossless; only the RGB<->YCbCr integer rounding moves
    # values, and the JPEG matrix pair stays within 3 LSB round-trip
    assert np.abs(back.astype(int) - frames.astype(int)).max() <= 3


def test_y4m_mono_exact_and_c420_decode():
    from webindex.multimodal import y4m_decode, y4m_encode

    rng = np.random.default_rng(13)
    gray = rng.integers(0, 256, size=(2, 6, 10), dtype=np.uint8)
    back, _ = y4m_decode(y4m_encode(gray))
    assert np.array_equal(back[..., 0], gray)  # mono plane is bit-exact

    # hand-built C420jpeg stream (the y4m default colorspace): flat plane
    # values survive chroma upsampling exactly
    w, h = 4, 2
    header = b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420jpeg\n"
    y_plane = bytes([100] * (w * h))
    cb = bytes([90] * ((w // 2) * (h // 2)))
    cr = bytes([160] * ((w // 2) * (h // 2)))
    data = header + b"FRAME\n" + y_plane + cb + cr
    frames, fps = y4m_decode(data)
    assert frames.shape == (1, 2, 4, 3) and fps == (25, 1)
    assert (frames == frames[0, 0, 0]).all()  # uniform input -> uniform RGB


def test_frame_sampling():
    from webindex.multimodal import (
        FrameSampleStage,
        png_decode,
        y4m_decode,
    )

    tab = synth_media_table(12)
    vid_rows = [i for i, k in enumerate(tab.column("kind").to_pylist())
                if k == "video"]
    vids = tab.take(vid_rows)
    out = FrameSampleStage(step=2)(vids)
    # every video contributes ceil(n_frames / 2) rows
    n_expected = 0
    for payload in vids.column("payload").to_pylist():
        frames, _ = y4m_decode(payload)
        n_expected += (frames.shape[0] + 1) // 2
    assert out.num_rows == n_expected
    # sampled frames are decodable PNGs matching the source frame pixels
    # (within the YCbCr round-trip tolerance)
    first = out.take([0])
    src = y4m_decode(vids.column("payload").to_pylist()[0])[0][0]
    got = png_decode(first.column("payload").to_pylist()[0])
    assert got.shape == src.shape
    assert np.abs(got.astype(int) - src.astype(int)).max() <= 3


def test_frame_sampling_passthrough_keeps_content_type():
    """Non-video rows pass through FrameSampleStage with their REAL
    content_type — a downstream image/audio branch routes on it."""
    from webindex.multimodal import FrameSampleStage

    tab = synth_media_table(12)
    out = FrameSampleStage(step=2)(tab)
    in_ct = dict(zip(tab.column("media_id").to_pylist(),
                     tab.column("content_type").to_pylist()))
    for mid, ct in zip(out.column("media_id").to_pylist(),
                       out.column("content_type").to_pylist()):
        if in_ct[mid] == "video/x-yuv4mpeg2":
            assert ct == "image/png"
        else:
            assert ct == in_ct[mid]


@pytest.mark.usefixtures("ray_session")
def test_media_actor_pipeline():
    import ray.data as rd

    ds = rd.from_arrow(synth_media_table(30)).repartition(3)
    out = media_features(ds, concurrency=2, batch_size=8).to_pandas()
    assert len(out) == 30
    expect = DecodeStage()(synth_media_table(30)).to_pandas()
    got = out.sort_values("media_id").reset_index(drop=True)
    assert np.allclose(got["mean_value"], expect["mean_value"])


def test_media_features_pinned_fixture_hash():
    """The media_features driver entry is rows-only (binary codec decode
    has no SQL form), so its SEMANTICS are pinned here instead: the
    decoded feature table over the exact seeded fixture the entry uses
    (synth_media_table(120)) must hash to a frozen constant — any codec
    or feature drift across rounds becomes a loud failure, the oracle
    role an SQL hash-match plays elsewhere."""
    import hashlib

    tab = synth_media_table(120)
    df = DecodeStage()(tab).to_pandas().sort_values(
        "media_id").reset_index(drop=True)
    df["mean_r"] = df["mean_value"].round(6)
    df["std_r"] = df["std_value"].round(6)
    key = df[["media_id", "kind", "width", "height", "channels",
              "n_frames", "mean_r", "std_r"]].to_csv(index=False).encode()
    assert hashlib.sha256(key).hexdigest() == (
        "98f7c96f0391f054b775cf37468b83fa5c5b94bcf5b0a35ae9b40d555cfcc1e2"
    )


def test_bpeish_count_re2_equivalent():
    """The SQL oracle for bpe_token_counts uses an RE2-safe pattern (no
    lookahead); its match count must equal token_count_batch's filtered
    GPT-2-ish count on apostrophe/whitespace stress cases."""
    import re

    import pyarrow as pa

    from webindex.textstats import token_count_batch

    re2 = re.compile(
        r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"
    )
    cases = [
        "it's a test", "they're 42bit", "  leading", "a''b",
        "don't  stop", "x\ty\nz", "", "   ", '{"k": 69}',
        "mixed42words and-hyphens, punct!!", "trailing space ",
    ]
    batch = pa.table(
        {"doc_id": pa.array(range(len(cases)), pa.int64()),
         "text": pa.array(cases)}
    )
    out = token_count_batch(batch)
    got = out.column("n_bpeish_tokens").to_pylist()
    want = [len(re2.findall(t)) for t in cases]
    assert got == want
    assert out.column("n_ws_tokens").to_pylist() == [
        len(t.split()) for t in cases
    ]


@pytest.mark.usefixtures("ray_session")
def test_grouped_topk_matches_pandas():
    """Per-batch local top-k is a valid superset: the distributed cut over
    many partitions equals a single-process sort+head, including ties."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from webindex.relational import grouped_topk

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], 200),
            "id": np.arange(200),
            # heavy ties: values in {0..4} so the doc_id tie-break matters
            "v": rng.integers(0, 5, 200),
        }
    )
    out = (
        grouped_topk(
            rd.from_pandas(df).repartition(7), ["g"], "v", 4,
            descending=True, tie_cols=["id"], n_parts=5,
        )
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["g", "v", "id"], ascending=[True, False, True],
                       kind="mergesort")
        .groupby("g", sort=False)
        .head(4)
        .reset_index(drop=True)
    )
    want["rank"] = want.groupby("g", sort=False).cumcount() + 1
    want = want.sort_values(["g", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["g", "id", "v", "rank"]], want[["g", "id", "v", "rank"]],
        check_dtype=False,
    )


def test_repetition_signals_hand_cases(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from webindex.textstats import repetition_batch

    docs = [
        # 4 lines, "ab" repeats (2 dup lines of 4); chars: total 2+2+2+1=7,
        # distinct {"ab","c"} = 3 -> dup_line_char_frac 4/7
        (0, "ab\nab\nab\nc"),
        # bigrams of [x y x y x]: "x y" x2, "y x" x2 -> top2 2/4;
        # 3-grams: [x y x, y x y, x y x] -> dup 1/3; 5-grams: 1 total 0 dup
        (1, "x y x y x"),
        (2, ""),  # empty: one empty line, no tokens
        (3, "one"),  # single token: no bigrams at all
        (4, "a a a a a a"),  # maximal repetition: top2 5/5, dup3 3/4
    ]
    batch = pa.table(
        {"doc_id": pa.array([d for d, _ in docs], pa.int64()),
         "text": pa.array([t for _, t in docs])}
    )
    out = repetition_batch(batch).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_lines"] == 4
    assert out.loc[0, "dup_line_frac"] == 2 / 4
    assert out.loc[0, "dup_line_char_frac"] == 4 / 7
    assert out.loc[1, "top2gram_frac"] == 2 / 4
    assert out.loc[1, "dup3gram_frac"] == 1 / 3
    assert out.loc[1, "dup5gram_frac"] == 0.0
    assert out.loc[2, "n_lines"] == 1
    assert (out.loc[2] == [1, 0, 0, 0, 0, 0]).all()
    assert out.loc[3, "top2gram_frac"] == 0.0
    assert out.loc[4, "top2gram_frac"] == 1.0
    assert out.loc[4, "dup3gram_frac"] == 3 / 4
    assert out.loc[4, "dup5gram_frac"] == 1 / 2


def test_deterministic_sample_properties(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from webindex.relational import deterministic_sample, stratified_sample

    n = 2000
    tab = pa.table(
        {"doc_id": pa.array(np.arange(n), pa.int64()),
         "lang": pa.array(["en", "de", "fr"][i % 3] for i in range(n))}
    )
    ds = rd.from_arrow(tab)

    s10 = set(deterministic_sample(ds, 0.1).to_pandas()["doc_id"])
    s30 = set(deterministic_sample(ds, 0.3).to_pandas()["doc_id"])
    # nesting: a grown frac keeps everything it kept before
    assert s10 <= s30
    # rate lands near the target (md5 is uniform)
    assert 0.05 < len(s10) / n < 0.15
    assert 0.24 < len(s30) / n < 0.36
    # partition-independent
    s30b = set(
        deterministic_sample(ds.repartition(13), 0.3)
        .to_pandas()["doc_id"]
    )
    assert s30 == s30b
    # salt decorrelates
    s30c = set(
        deterministic_sample(ds, 0.3, salt="v2").to_pandas()["doc_id"]
    )
    assert s30 != s30c

    st = stratified_sample(ds, "lang", {"en": 0.5, "de": 0.1}).to_pandas()
    by = st.groupby("lang")["doc_id"].count()
    assert "fr" not in by.index  # default_frac 0 drops the stratum
    assert by["en"] > by.get("de", 0)
    # per-stratum membership equals the flat rule at that stratum's frac
    en_flat = {
        d for d in tab.column("doc_id").to_pylist()
        if d % 3 == 0  # lang == en
    } & set(deterministic_sample(ds, 0.5).to_pandas()["doc_id"])
    assert set(st[st["lang"] == "en"]["doc_id"]) == en_flat


def test_unigram_logprob_matches_brute(ray_session):
    import math
    import re
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from webindex.textstats import unigram_logprob

    docs = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the log"),
        (2, "completely different words entirely"),
        (3, ""),
        (4, "the the the"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
    )
    out = (
        unigram_logprob(ds, n_parts=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    tok = re.compile(r"[a-z0-9]+")
    cf: Counter = Counter()
    per_doc = {}
    for d, t in docs:
        tfs = Counter(tok.findall(t.lower()))
        per_doc[d] = tfs
        cf.update(tfs)
    total = sum(cf.values())
    for d, tfs in per_doc.items():
        if not tfs:
            assert d not in out.index
            continue
        lp = 0.0
        for term in sorted(tfs):  # ascending-term sequential fold
            lp += tfs[term] * math.log(cf[term] / total)
        row = out.loc[d]
        assert int(row["n_tokens"]) == sum(tfs.values()), d
        # summation ORDER is engine-specific for long float folds
        # (numpy reduceat != sequential != DuckDB list_sum, measured) —
        # the contract surface rounds to 6dp; here compare to 1e-12 rel
        assert math.isclose(
            float(row["logprob"]), lp, rel_tol=1e-12
        ), d
        assert math.isclose(
            float(row["logprob_per_token"]), lp / sum(tfs.values()),
            rel_tol=1e-12,
        )
    # repeated-token doc must score higher per-token than the unique doc
    assert (
        out.loc[4, "logprob_per_token"] > out.loc[2, "logprob_per_token"]
    )


def test_source_level_filter_matches_brute(ray_session):
    import re
    from collections import defaultdict

    import pyarrow as pa
    import ray.data as rd

    from webindex.textstats import source_level_filter

    rng = __import__("numpy").random.default_rng(9)
    words = "alpha beta gamma delta epsilon".split()
    docs = []
    for i in range(120):
        n = int(rng.integers(2, 12))
        docs.append(
            (i, " ".join(words[int(j)] for j in rng.integers(0, 5, n)),
             f"host{i % 6}")
        )
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _, _ in docs], pa.int64()),
                "text": pa.array([t for _, t, _ in docs]),
                "source": pa.array([s for _, _, s in docs]),
            }
        )
    )
    short_tokens, cutoff = 7, 0.5
    out = (
        source_level_filter(
            ds, short_tokens=short_tokens, max_short_frac=cutoff, n_parts=8
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    tok = re.compile(r"[a-z0-9]+")
    agg = defaultdict(lambda: [0, 0])
    for _d, t, s in docs:
        agg[s][0] += 1
        if len(tok.findall(t.lower())) < short_tokens:
            agg[s][1] += 1
    kept_vals = set()
    for d, _t, s in docs:
        row = out.loc[d]
        docs_n, short_n = agg[s]
        assert row["source"] == s
        assert int(row["src_docs"]) == docs_n
        assert float(row["src_short_frac"]) == short_n / docs_n
        assert bool(row["keep"]) == (short_n / docs_n <= cutoff)
        kept_vals.add(bool(row["keep"]))
    assert kept_vals == {True, False}  # fixture exercises both verdicts


def test_pmi_collocations_matches_brute(ray_session):
    import math
    import re
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from webindex.textstats import pmi_collocations

    rng = __import__("numpy").random.default_rng(31)
    words = "red blue fish cake stone wind".split()
    docs = []
    for i in range(80):
        n = int(rng.integers(5, 25))
        toks = [words[int(j)] for j in rng.integers(0, 6, n)]
        if i % 3 == 0:
            toks[1:3] = ["red", "fish"]  # engineered collocation
        docs.append((i, " ".join(toks)))
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
    )
    w, mc, topn = 2, 3, 8
    got = pmi_collocations(
        ds, window=w, min_count=mc, top_n=topn, n_parts=8
    )

    tok = re.compile(r"[a-z0-9]+")
    cnt: Counter = Counter()
    for _d, t in docs:
        toks = tok.findall(t.lower())
        for i in range(len(toks)):
            for j in range(i + 1, min(i + w + 1, len(toks))):
                a, b = toks[i], toks[j]
                if a != b:
                    cnt[tuple(sorted((a, b)))] += 1
    total = sum(cnt.values())
    marg: Counter = Counter()
    for (a, b), c in cnt.items():
        marg[a] += c
        marg[b] += c
    want = sorted(
        (
            (math.log((c * total) / (marg[a] * marg[b])), a, b, c)
            for (a, b), c in cnt.items()
            if c >= mc
        ),
        key=lambda e: (-e[0], e[1], e[2]),
    )[:topn]
    have = [
        (float(r.pmi), r.a, r.b, int(r.cnt))
        for r in got.itertuples()
    ]
    assert have == [(p, a, b, c) for p, a, b, c in want]
    assert list(got["rank"]) == list(range(1, len(want) + 1))
    assert ("fish", "red") in {(b, a) for _p, a, b, _c in want} or (
        "fish", "red") in {(a, b) for _p, a, b, _c in want}


def test_textrank_keywords_matches_reimplementation(ray_session):
    """Fixed-point TextRank: independent integer replay of the pinned
    update rule (SCALE=1e12, damping 17/20, per-edge floor division)."""
    import re

    import pyarrow as pa
    import ray.data as rd

    from webindex.textstats import TEXTRANK_SCALE, textrank_keywords

    docs = [
        (0, "graph rank graph node edge rank graph walk node graph"),
        (1, "single"),
        (2, ""),
        (3, "a b c d e f g a b a"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
    )
    w, k, iters = 2, 4, 20
    out = textrank_keywords(ds, window=w, top_k=k, iters=iters).to_pandas()
    tok = re.compile(r"[a-z0-9]+")
    S = TEXTRANK_SCALE
    for did, text in docs:
        toks = tok.findall(text.lower())
        sub = out[out["doc_id"] == did].sort_values("rank")
        if not toks:
            assert sub.empty
            continue
        vocab = sorted(set(toks))
        vi = {x: i for i, x in enumerate(vocab)}
        v = len(vocab)
        # pure-Python integer replay (no numpy: independent arithmetic)
        wm = [[0] * v for _ in range(v)]
        for i in range(len(toks)):
            for j in range(i + 1, min(i + w + 1, len(toks))):
                a, b = vi[toks[i]], vi[toks[j]]
                if a != b:
                    wm[a][b] += 1
                    wm[b][a] += 1
        deg = [sum(row) for row in wm]
        p = [S // v] * v
        base = (3 * S) // (20 * v)
        for _ in range(iters):
            nxt = []
            for a in range(v):
                c = sum(
                    (wm[a][b] * p[b]) // deg[b]
                    for b in range(v) if wm[a][b]
                )
                nxt.append(base + (17 * c) // 20)
            p = nxt
        order = sorted(range(v), key=lambda i: (-p[i], vocab[i]))[:k]
        want = [(vocab[i], p[i]) for i in order]
        got = list(zip(sub["term"], sub["score_q"]))
        assert [t for t, _ in got] == [t for t, _ in want], did
        for (_, gs), (_, ws) in zip(got, want):
            assert int(gs) == ws, did
    # the engineered repeated hub term dominates doc 0
    top0 = out[(out["doc_id"] == 0) & (out["rank"] == 1)]["term"].iloc[0]
    assert top0 == "graph"


def test_temperature_mix_matches_brute(ray_session):
    import hashlib
    import math
    import re

    import pyarrow as pa
    import ray.data as rd

    from webindex.relational import temperature_mix

    np_ = __import__("numpy")
    rng = np_.random.default_rng(13)
    words = "one two three four five".split()
    docs = []
    for i in range(300):
        src = f"s{i % 4}"
        # s0 gets much longer docs -> big source, downsampled hardest
        n = int(rng.integers(40, 80)) if src == "s0" else int(
            rng.integers(5, 15)
        )
        docs.append(
            (i, " ".join(words[int(j)] for j in rng.integers(0, 5, n)),
             src)
        )
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _, _ in docs], pa.int64()),
                "text": pa.array([t for _, t, _ in docs]),
                "source": pa.array([s for _, _, s in docs]),
            }
        )
    )
    got = temperature_mix(ds, n_parts=8).to_pandas()
    kept = set(got["doc_id"].astype(int))

    tok = re.compile(r"[a-z0-9]+")
    n_by = {}
    for _d, t, s in docs:
        n_by[s] = n_by.get(s, 0) + len(tok.findall(t.lower()))
    n_min = min(n_by.values())
    want = set()
    for d, _t, s in docs:
        frac = math.sqrt(n_min / n_by[s])
        thr = format(min(int(frac * 16**8), 16**8 - 1), "08x")
        if hashlib.md5(str(d).encode()).hexdigest()[:8] < thr:
            want.add(d)
    assert kept == want
    # the big source must be downsampled harder than the small ones
    by_src = got.groupby("source").size()
    total = {s: sum(1 for _d, _t, x in docs if x == s) for s in n_by}
    keep_rate = {s: by_src.get(s, 0) / total[s] for s in n_by}
    assert keep_rate["s0"] < min(
        v for s, v in keep_rate.items() if s != "s0"
    )


@pytest.mark.usefixtures("ray_session")
def test_dsir_weights_hand_oracle():
    """DSIR log-importance weights vs a from-first-principles recompute
    on a tiny corpus, plus n_parts partition invariance."""
    import math
    from collections import Counter

    import ray.data as rd

    from webindex.textstats import dsir_weights

    docs = [
        (0, "the cat sat on the mat", "en"),
        (1, "the cat ate", "en"),
        (2, "le chat noir le chat", "fr"),
        (3, "cat mat cat mat", "fr"),
        (4, "x", "en"),  # single token: no bigrams, absent from output
    ]

    def grams(t):
        toks = t.split()
        return Counter(
            toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
        )

    raw, tgt = Counter(), Counter()
    per_doc = {}
    for did, t, lang in docs:
        g = grams(t)
        per_doc[did] = g
        raw.update(g)
        if lang == "en":
            tgt.update(g)
    t_raw, t_tgt, v = sum(raw.values()), sum(tgt.values()), len(raw)
    want = {}
    for did, g in per_doc.items():
        if not g:
            continue
        w = 0.0
        for f in sorted(g):
            w += g[f] * (math.log((tgt.get(f, 0) + 1) / (t_tgt + v))
                         - math.log((raw[f] + 1) / (t_raw + v)))
        want[did] = w

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _, _ in docs], pa.int64()),
        "text": pa.array([t for _, t, _ in docs]),
        "lang": pa.array([x for _, _, x in docs]),
    }))
    got = {r["doc_id"]: r["dsir_w"]
           for r in dsir_weights(ds).take_all()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)
    # target docs should score higher than off-target on this corpus
    assert got[0] > got[2]
    # partition invariance at 6dp (the contract surface)
    got7 = {r["doc_id"]: round(r["dsir_w"], 6)
            for r in dsir_weights(ds, n_parts=7).take_all()}
    assert got7 == {k: round(x, 6) for k, x in got.items()}


def test_bigram_logprob_matches_brute(ray_session):
    import math
    import re
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from webindex.textstats import bigram_logprob

    docs = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the log"),
        (2, "completely different words entirely"),
        (3, ""),
        (4, "single"),
        (5, "the the the the"),
        (6, "cat sat cat sat cat"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
    )
    lam = 0.8
    oml = 1.0 - lam
    out = (
        bigram_logprob(ds, lam=lam, n_parts=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    tok = re.compile(r"[a-z0-9]+")
    cu: Counter = Counter()
    cb: Counter = Counter()
    per_doc = {}
    for d, t in docs:
        toks = tok.findall(t.lower())
        cu.update(toks)
        pairs = Counter(zip(toks, toks[1:]))
        per_doc[d] = pairs
        cb.update(pairs)
    total = sum(cu.values())
    cp = Counter()
    for (w1, _), c in cb.items():
        cp[w1] += c
    for d, pairs in per_doc.items():
        if not pairs:
            assert d not in out.index
            continue
        lp, nb = 0.0, 0
        for (w1, w2) in sorted(pairs):  # ascending (w1, w2) fold
            n = pairs[(w1, w2)]
            p = lam * (cb[(w1, w2)] / cp[w1]) + oml * (cu[w2] / total)
            lp += n * math.log(p)
            nb += n
        row = out.loc[d]
        assert int(row["n_bigrams"]) == nb
        assert row["logprob"] == pytest.approx(lp, rel=1e-12)
        assert row["logprob_per_bigram"] == pytest.approx(lp / nb,
                                                          rel=1e-12)
    assert set(out.index) == {d for d, p in per_doc.items() if p}


def test_bigram_logprob_partition_invariance(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from webindex.textstats import bigram_logprob

    rng = np.random.default_rng(11)
    vocab = "aa bb cc dd ee ff gg hh".split()
    docs = [
        (i, " ".join(vocab[int(j)] for j in rng.integers(0, 8, size=12)))
        for i in range(40)
    ]
    tab = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs]),
        }
    )
    outs = []
    for n_parts, n_blocks in [(4, 1), (16, 5)]:
        ds = rd.from_arrow(tab)
        if n_blocks > 1:
            ds = ds.repartition(n_blocks)
        df = (
            bigram_logprob(ds, n_parts=n_parts)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(df)
    a, b = outs
    assert a.equals(b)


def test_chunk_documents_matches_brute(ray_session):
    import re

    import pyarrow as pa
    import ray.data as rd

    from webindex.textstats import chunk_documents

    docs = [
        (0, "one two three four five six seven eight nine ten"),
        (1, "alpha beta"),
        (2, ""),
        (3, "x " * 13),  # 13 tokens: windows at 0, 6, 12
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
    )
    out = (
        chunk_documents(ds, max_tokens=8, overlap=2)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    tok = re.compile(r"[a-z0-9]+")
    want = []
    for d, t in docs:
        toks = tok.findall(t.lower())
        for cid, s in enumerate(range(0, len(toks), 6)):
            w = toks[s: s + 8]
            want.append((d, cid, " ".join(w), len(w)))
    got = [
        (int(r.doc_id), int(r.chunk_id), r.chunk_text, int(r.n_tokens))
        for r in out.itertuples(index=False)
    ]
    assert got == sorted(want)
    assert not (out["doc_id"] == 2).any()  # empty doc: no chunks
    # overlap property: consecutive windows share exactly `overlap` tokens
    g = out[out["doc_id"] == 0].sort_values("chunk_id")
    rows = list(g["chunk_text"])
    assert len(rows) == 2
    assert rows[0].split()[-2:] == rows[1].split()[:2]
    with pytest.raises(ValueError):
        chunk_documents(ds, max_tokens=8, overlap=8)


def test_gopher_rules_hand_cases(ray_session):
    import ray.data as rd

    from webindex.textstats import gopher_rules

    good = ("the quick brown fox jumps over the lazy dog and that dog "
            "has to be with all of our friends every single day ") * 3
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            good,                       # passes everything
            "short text the of",        # < 50 words
            ("#" * 30 + " ") * 60,      # symbol ratio 1.0, no alpha
            "",                         # token-less
        ], pa.string()),
    })
    got = (gopher_rules(rd.from_arrow(docs).repartition(2))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got.loc[0, "keep"] == 1
    assert got.loc[0, "n_stop_hits"] >= 2
    assert got.loc[1, "keep"] == 0 and got.loc[1, "n_words"] == 4
    assert got.loc[2, "keep"] == 0
    assert got.loc[2, "symbol_ratio_r"] > 0.1
    assert got.loc[2, "alpha_frac_r"] == 0.0
    assert (got.loc[3, ["n_words", "keep"]] == 0).all()


def test_perplexity_buckets_matches_brute(ray_session):
    """CCNet tercile bucketing: replay unigram lpt + nearest-rank
    per-lang cutoffs in plain Python; every doc assigned, terciles
    balanced within nearest-rank rounding."""
    import collections
    import math

    import pyarrow as pa
    import ray.data as rd

    from webindex.textstats import _ASCII_TOK_RE, perplexity_buckets

    rng = np.random.default_rng(5)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "rare"]
    docs = []
    for i in range(90):
        n = int(rng.integers(5, 30))
        words = [vocab[int(j)] for j in rng.integers(0, 6, size=n)]
        if i % 9 == 0:
            words.append("rare")
        docs.append((i, " ".join(words), ["en", "fr"][i % 2]))

    tab = pa.table(
        {
            "doc_id": pa.array([d for d, _, _ in docs], pa.int64()),
            "text": pa.array([t for _, t, _ in docs]),
            "lang": pa.array([la for _, _, la in docs]),
        }
    )
    got = perplexity_buckets(
        rd.from_arrow(tab).repartition(4), n_parts=8
    ).to_pandas()

    # brute: unigram lpt per doc, 6dp round, per-lang nearest-rank cuts
    cf = collections.Counter()
    toks = {}
    for did, t, _la in docs:
        toks[did] = _ASCII_TOK_RE.findall(t.lower())
        cf.update(toks[did])
    total = sum(cf.values())
    lpt = {}
    for did, _t, _la in docs:
        tf = collections.Counter(toks[did])
        lp = sum(
            c * math.log(cf[w] / total) for w, c in sorted(tf.items())
        )
        lpt[did] = round(lp / len(toks[did]), 6)
    by_lang = collections.defaultdict(list)
    for did, _t, la in docs:
        by_lang[la].append(lpt[did])
    want = {}
    for did, _t, la in docs:
        vs = sorted(by_lang[la])
        n = len(vs)
        c1 = vs[-(-n // 3) - 1]
        c2 = vs[-(-2 * n // 3) - 1]
        v = lpt[did]
        want[did] = "tail" if v <= c1 else ("middle" if v <= c2 else "head")

    assert len(got) == len(docs)
    for _, r in got.iterrows():
        assert r["bucket"] == want[int(r["doc_id"])], r["doc_id"]
    # all three buckets non-empty per lang on this fixture
    for la in ("en", "fr"):
        seen = set(got[got["lang"] == la]["bucket"])
        assert seen == {"head", "middle", "tail"}, la
