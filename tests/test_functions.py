"""Unit tests: tokenizer goldens, varbyte codec, BM25 kernel (SURVEY §5.1)."""

import math

import numpy as np
import pytest

from openmatch_spark.analysis import tokenize_dpr_py, tokenize_simple_py
from openmatch_spark.functions.bm25 import bm25_weight, bm25_weight_scalar, lucene_idf
from openmatch_spark.functions.codec import (
    decode_postings,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)


class TestTokenizer:
    def test_basic_words(self):
        assert tokenize_dpr_py("Hello world") == ["hello", "world"]

    def test_punctuation_separate_tokens(self):
        # non-whitespace non-word chars are single-char tokens (NON_WS branch)
        assert tokenize_dpr_py("a,b") == ["a", ",", "b"]

    def test_digits_and_mixed(self):
        assert tokenize_dpr_py("term0042 x9y") == ["term0042", "x9y"]

    def test_nfd_accents_kept_with_marks(self):
        # NFD decomposes é; \p{M} keeps the combining mark inside the token
        toks = tokenize_dpr_py("Café")
        assert len(toks) == 1 and toks[0].startswith("cafe")

    def test_cjk_run_single_token(self):
        assert tokenize_dpr_py("中文 test") == ["中文", "test"]

    def test_empty_and_none(self):
        assert tokenize_dpr_py("") == []
        assert tokenize_dpr_py(None) == []
        assert tokenize_simple_py(None) == []

    def test_simple_ascii_split(self):
        assert tokenize_simple_py("The fast, brown-fox 42!") == [
            "the", "fast", "brown", "fox", "42",
        ]


class TestCodec:
    @pytest.mark.parametrize("n", [0, 1, 3, 257, 5000])
    def test_roundtrip_random(self, n):
        rng = np.random.default_rng(n)
        ids = np.unique(rng.integers(0, 2**40, size=n)) if n else np.empty(0, dtype=np.int64)
        assert np.array_equal(decode_postings(encode_postings(ids)), ids)

    def test_dense_compresses(self):
        ids = np.arange(0, 10000, dtype=np.int64)
        assert len(encode_postings(ids)) < 2 * len(ids)  # ~1.25 B/gap

    def test_varbyte_known_values(self):
        assert varbyte_encode(np.array([0])) == b"\x00"
        assert varbyte_encode(np.array([127])) == b"\x7f"
        assert varbyte_encode(np.array([128])) == b"\x80\x01"
        assert list(varbyte_decode(b"\x80\x01")) == [128]


class TestBM25Kernel:
    def test_idf_hand_number(self):
        # N=100, df=10 -> ln(1 + 90.5/10.5)
        assert lucene_idf(10, 100) == pytest.approx(math.log(1 + 90.5 / 10.5))

    def test_weight_hand_number(self):
        # tf=2, dl=100, avgdl=100 -> idf * 2/(2 + 0.9*(0.6+0.4*1))
        w = bm25_weight(2, 100, 1.0, 100.0)
        assert w == pytest.approx(2 / (2 + 0.9))

    def test_scalar_matches_vector(self):
        v = bm25_weight(3, 80, lucene_idf(7, 500), 95.0)
        s = bm25_weight_scalar(3, 80, 7, 500, 95.0)
        assert float(v) == pytest.approx(s, rel=1e-15)
