"""M11/M12 helper kernels vs hand-computed expectations."""

import numpy as np
import pyarrow as pa

from webindex.textutil import (
    ascii_fold,
    clean_text_array,
    drop_empty_text,
    generate_unique,
    move_columns_after,
    pct_round,
    rescale_minmax,
    truncate_text_array,
    unique_list,
)


def test_clean_and_drop():
    arr = pa.array(["  a  ", "", "   ", "b"])
    cleaned = clean_text_array(arr)
    assert cleaned.to_pylist() == ["a", None, None, "b"]
    tab = pa.table({"text": arr, "x": [1, 2, 3, 4]})
    out = drop_empty_text(tab)
    assert out.column("x").to_pylist() == [1, 4]
    assert out.column("text").to_pylist() == ["a", "b"]


def test_truncate_marks_suffix():
    arr = pa.array(["abcdef", "abc"])
    out = truncate_text_array(arr, 4)
    assert out.to_pylist() == ["abcd (...)", "abc"]


def test_ascii_fold_and_unique():
    assert ascii_fold("café crème!") == "cafe_creme_"
    assert generate_unique("col", ["col"]) == "col_1"
    assert generate_unique("col", ["col", "col_1"]) == "col_2"
    assert generate_unique("naïve", [], prefix="p_") == "p_naive"
    assert unique_list([3, 1, 3, 2, 1]) == [3, 1, 2]


def test_move_columns_after():
    tab = pa.table({"a": [1], "b": [2], "c": [3], "d": [4]})
    out = move_columns_after(tab, ["d", "b"], "a")
    assert out.column_names == ["a", "d", "b", "c"]


def test_score_projections():
    # banker's rounding, same as the reference's Python round()
    assert pct_round([0.12345]).tolist() == [12.34]
    assert pct_round([0.126]).tolist() == [12.6]
    r = rescale_minmax([2.0, 4.0, 6.0])
    assert np.allclose(r, [0.0, 0.5, 1.0])
    assert np.allclose(rescale_minmax([5.0, 5.0]), [0.0, 0.0])
