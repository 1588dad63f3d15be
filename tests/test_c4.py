"""C4 cleaning rules (textstats.c4_filters) — hand-built rule oracle."""

import pyarrow as pa

from webindex.textstats import c4_filters

DOCS = [
    # 4 clean sentences of 5+ words -> keep
    (0, "the quick brown fox jumps.\nover the lazy dog today.\n"
        "a third full sentence here.\nand a fourth one too."),
    # only 2 kept lines (one unterminated, one short) -> drop
    (1, "this line has no terminal punctuation\nshort line.\n"
        "a proper full sentence here.\nanother proper full sentence here."),
    # javascript line removed, leaving 2 kept -> drop
    (2, "please enable javascript to continue.\n"
        "a proper full sentence here.\nanother proper full sentence here."),
    # lorem ipsum page flag -> drop, lines still counted
    (3, "lorem ipsum dolor sit amet.\na proper full sentence here.\n"
        "another proper full sentence here.\nyet another good sentence here."),
    # brace page flag -> drop
    (4, "function f() { return 1; }\na proper full sentence here.\n"
        "another proper full sentence here.\nyet another good sentence here."),
    # badword page flag -> drop
    (5, "this page mentions badword1 sadly.\na proper full sentence here.\n"
        "another proper full sentence here.\nyet another good sentence here."),
    # quote-terminated lines count as sentences
    (6, 'he said "hello there my friend."\nshe replied "fine thank you sir."\n'
        'and then they left the room."'),
]


def test_c4_rules(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
        "text": pa.array([t for _, t in DOCS]),
    }))
    out = {r["doc_id"]: r for r in
           c4_filters(ds, badwords={"badword1"}).take_all()}
    assert out[0]["keep"] == 1 and out[0]["n_kept_lines"] == 4
    assert out[0]["kept_text"] == DOCS[0][1]

    assert out[1]["keep"] == 0 and out[1]["n_kept_lines"] == 2
    assert out[1]["n_lines"] == 4

    assert out[2]["keep"] == 0 and out[2]["n_kept_lines"] == 2

    assert out[3]["has_lorem"] == 1 and out[3]["keep"] == 0
    assert out[3]["n_kept_lines"] == 4  # lines kept; page flag drops it

    assert out[4]["has_brace"] == 1 and out[4]["keep"] == 0
    assert out[5]["has_badword"] == 1 and out[5]["keep"] == 0

    assert out[6]["n_kept_lines"] == 3 and out[6]["keep"] == 1
    assert out[6]["n_kept_words"] == 18


def test_c4_empty_and_counts(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([9], pa.int64()),
        "text": pa.array([""]),
    }))
    r = c4_filters(ds).take_all()[0]
    assert r["n_lines"] == 0 and r["keep"] == 0 and r["kept_text"] == ""
