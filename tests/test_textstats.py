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


def test_media_decode_and_resize():
    tab = synth_media_table(10)
    feats = DecodeStage(fake=True)(tab)
    assert feats.num_rows == 10
    assert all(w >= 4 for w in feats.column("width").to_pylist())
    rz = ResizeStage(out_w=4, out_h=4)(tab)
    arr = _decode_fake(rz.column("payload").to_pylist()[0])
    assert arr.shape == (4, 4, 3)


def test_media_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        DecodeStage(fake=False)


@pytest.mark.usefixtures("ray_session")
def test_media_actor_pipeline():
    import ray.data as rd

    ds = rd.from_arrow(synth_media_table(30)).repartition(3)
    out = media_features(ds, concurrency=2, batch_size=8).to_pandas()
    assert len(out) == 30
    expect = DecodeStage(fake=True)(synth_media_table(30)).to_pandas()
    got = out.sort_values("media_id").reset_index(drop=True)
    assert np.allclose(got["mean_value"], expect["mean_value"])
