"""Reference-surface util helpers (reference: pyprob/util.py:80-455)."""

import numpy as np

import pyprob_tpu.util as u


def test_small_helpers():
    assert u.to_size([2, 3]) == (2, 3) and u.to_size(4) == (4,)
    assert u.prod([2, 3, 4]) == 24
    assert list(u.chunks([1, 2, 3, 4, 5], 2)) == [[1, 2], [3, 4], [5]]
    assert u.is_sorted([1, 2, 2, 5]) and not u.is_sorted([2, 1])
    assert u.rgb_to_hex((1, 0, 0)) == "#ff0000"
    assert u.distribution_short_name("Normal") == "N"
    assert u.distribution_short_name("Laplace") == "Laplace"
    assert np.asarray(u.one_hot(4, 2)).tolist() == [0, 0, 1, 0]
    assert u.float_to_string(1.0) == "1"
    r, c = u.tile_rows_cols(10)
    assert r * c >= 10
    assert u.is_hashable(3) and not u.is_hashable([])
    assert isinstance(u.check_gnu_dbm(), bool)
    assert u.to_tensor(None) is None
    assert float(u.to_tensor(2.0)) == 2.0
    assert isinstance(u.to_numpy([1.0]), np.ndarray)
    assert len(u.drop_items([1, 2, 3, 4], 2)) == 2
    assert u.time_seed() >= 0


def test_address_id_to_int():
    assert u.address_id_to_int("__A42__x") == 42
    assert u.address_id_to_int("A7__z") == 7
    assert u.address_id_to_int("plain") == 0


def test_replace_inf():
    x = u.replace_inf(np.array([1.0, np.inf]))
    assert x[1] == 0.0 and x[0] == 1.0


def test_shelf_codec_roundtrip(tmp_path):
    blob = u.sqlite_encode({"a": 1})
    assert u.sqlite_decode(blob) == {"a": 1}
    u.set_compression(9)
    try:
        assert u.sqlite_decode(u.sqlite_encode([1, 2])) == [1, 2]
    finally:
        u.set_compression(-1)
    sh = u.open_shelf(str(tmp_path / "s.sqlite"))
    sh["k"] = [1, 2]
    assert sh["k"] == [1, 2]
    sh.close()


def test_fast_np_random_choice_distribution():
    vals = np.array([0, 1, 2])
    cs = np.array([0.2, 0.5, 1.0])
    u.seed(0)
    draws = [int(u.fast_np_random_choice(vals, cs)) for _ in range(4000)]
    freqs = np.bincount(draws, minlength=3) / 4000
    assert np.allclose(freqs, [0.2, 0.3, 0.5], atol=0.04)


def test_progress_bar_trio(capsys):
    u.set_verbosity(2)
    try:
        u.progress_bar_init("msg", 10)
        u.progress_bar_update(5)
        u.progress_bar_end("done")
    finally:
        u.set_verbosity(1)
    assert "#" in capsys.readouterr().out
