"""Ngram (LIKE) index: build + block pruning."""

import numpy as np
import pytest

from databend_tpu.index.ngram import (build_ngram_filter, filter_may_match,
                                      ngrams, pattern_grams)


def test_ngrams_and_pattern_grams():
    assert ngrams("hello") == {"hel", "ell", "llo"}
    assert pattern_grams("%hello%") == {"hel", "ell", "llo"}
    assert pattern_grams("he_lo") == set()  # segments shorter than gram
    assert pattern_grams("%abc\\%def%") == ngrams("abc%def")


def test_filter_membership(tmp_catalog):
    from databend_tpu.expression import Column
    from databend_tpu.types import String
    col = Column.from_pylist(["the quick brown fox", "lazy dog"], String)
    flt = build_ngram_filter(col)
    assert filter_may_match(flt, "%quick%")
    assert filter_may_match(flt, "%dog%")
    assert not filter_may_match(flt, "%zebra%")


def test_ngram_prunes_blocks(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE ng (id BIGINT, body VARCHAR) ROW_PER_BLOCK='2'")
    c.sql("CREATE NGRAM INDEX ngi ON ng(body)")
    c.sql("""INSERT INTO ng VALUES
        (1, 'alpha bravo'), (2, 'charlie delta'),
        (3, 'echo foxtrot'), (4, 'golf hotel'),
        (5, 'india juliet'), (6, 'kilo lima')""")
    rows = c.sql("SELECT id FROM ng WHERE body LIKE '%foxtrot%'").rows()
    assert rows == [(3,)]
    # explain analyze shows pruning happened (3 blocks -> 1)
    r = c.sql("EXPLAIN ANALYZE SELECT id FROM ng WHERE body LIKE '%foxtrot%'")
    txt = "\n".join(x[0] for x in r.rows())
    assert "block" in txt.lower()
    # negative pattern returns nothing and prunes everything
    assert c.sql("SELECT count(*) FROM ng WHERE body LIKE '%zzzqqq%'").scalar() == 0
