"""Native C++ analyzer parity: tokenization and the full index build must
match the pure-Python path byte-for-byte (native/tokenize.cpp vs
index/inverted/tokenizer.py).
"""

import os

import numpy as np
import pytest

from databend_tpu import native
from databend_tpu.expression import Column
from databend_tpu.index.inverted import writer as W
from databend_tpu.index.inverted.tokenizer import (ENGLISH_STOPWORDS,
                                                   tokenize_docs,
                                                   tokenize_text)
from databend_tpu.types import String

TEXTS = [
    "The quick brown Fox_1 jumps over 2 lazy dogs!",
    "",
    "汉字とカタカナ and english 가나",
    "stop the and words",
    "punct,separated;tokens--here (and) [more]",
    "UPPER lower MiXeD 123abc_def",
]


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_tokenize_batch_matches_python():
    nat = native.tokenize_batch(TEXTS, None)
    py = [tokenize_text(t, "english", []) for t in TEXTS]
    assert nat == py
    nat_s = native.tokenize_batch(TEXTS, ENGLISH_STOPWORDS)
    py_s = [tokenize_text(t, "english", ["english_stop"]) for t in TEXTS]
    assert nat_s == py_s


def test_tokenize_docs_with_stemmer():
    got = tokenize_docs(TEXTS, "english", ["english_stop", "english_stemmer"])
    want = [tokenize_text(t, "english", ["english_stop", "english_stemmer"])
            for t in TEXTS]
    assert got == want


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_index_build_native_python_identical(tmp_path):
    rng = np.random.default_rng(3)
    texts = [" ".join(f"w{rng.integers(0, 50)} Running the jumped"
                      for _ in range(8)) for _ in range(400)]
    texts[7] = "汉字とカタカナ mixed 가 text"
    texts[9] = ""
    cols = [Column.from_pylist(texts, String)]
    opts = {"tokenizer": "english", "filters": "english_stop,english_stemmer"}
    p_nat = str(tmp_path / "nat.npz")
    p_py = str(tmp_path / "py.npz")
    W.build_inverted_index(p_nat, cols, opts)
    orig = W._analyze_native
    W._analyze_native = lambda *a, **k: None
    try:
        W.build_inverted_index(p_py, cols, opts)
    finally:
        W._analyze_native = orig
    a, b = np.load(p_nat), np.load(p_py)
    assert set(a.files) == set(b.files)
    for k in a.files:
        assert np.array_equal(a[k], b[k]), k


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_analyze_batch_structure():
    terms, tok_term, tok_doc = native.analyze_batch(
        ["aa bb aa", "bb cc"], None)
    assert terms == ["aa", "bb", "cc"]  # first-seen order
    assert tok_term.tolist() == [0, 1, 0, 1, 2]
    assert tok_doc.tolist() == [0, 0, 0, 1, 1]
