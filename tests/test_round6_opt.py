"""Round-6 optimization invariants.

The optimizations must be pure performance: the driver-side expansion
fast path (query/expand.py _expansions_driver) must produce the SAME
variant sets, edit distances, buckets AND cap ordering as the
distributed dictionary scan it replaces, and the per-handle DataFrame /
handle memos must not change any query result.
"""

import random
import string
import tempfile

import pytest

from openmatch_spark.index import build_index, load_index
from openmatch_spark.query.expand import _expansions


@pytest.fixture(scope="module")
def fat_vocab_index(spark):
    rnd = random.Random(7)
    words = list({
        "".join(rnd.choices(string.ascii_lowercase[:6], k=rnd.randint(1, 7)))
        for _ in range(3000)
    })
    docs = [(f"d{i}", " ".join(rnd.choices(words, k=25))) for i in range(600)]
    pages = spark.createDataFrame(docs, "url string, text string")
    d = tempfile.mkdtemp(prefix="om_r6_expab_")
    build_index(spark, pages, d, analyzer="simple", num_shards=2,
                num_term_buckets=4, block_size=64)
    return load_index(spark, d)


def _ab(idx, toks, kind, edits, plen, mx):
    drv = _expansions(idx, toks, kind, edits, plen, mx)
    idx._vocab_cache = False  # force the distributed dictionary scan
    try:
        dist = _expansions(idx, toks, kind, edits, plen, mx)
    finally:
        idx._vocab_cache = None
    assert drv == dist, (kind, toks, edits, plen, mx)
    return drv


def test_expansions_driver_equals_distributed(fat_vocab_index):
    idx = fat_vocab_index
    rnd = random.Random(99)
    # fixed adversarial cases: short tokens vs prefix_len clamp, empty
    # literal prefixes, leading wildcards, full-class regexes
    _ab(idx, ["a", "ab"], "fuzzy", 2, 3, 10)     # token shorter than prefix
    _ab(idx, ["abc", "fedcb"], "fuzzy", 2, 0, 50)  # prefix_len=0 full scan
    _ab(idx, ["%ba", "_a%", "ab"], "wildcard", 0, 0, 10)
    _ab(idx, ["[af]b.*", "a{2,3}", "(aa|bb)c?"], "regexp", 0, 0, 50)
    _ab(idx, ["a", "fe", "zzz"], "prefix", 0, 0, 3)
    for _ in range(8):
        kind = rnd.choice(["prefix", "fuzzy", "wildcard", "regexp"])
        if kind == "fuzzy":
            toks = ["".join(rnd.choices(string.ascii_lowercase[:7],
                                        k=rnd.randint(1, 6)))
                    for _ in range(4)]
            edits, plen = rnd.choice([1, 2]), rnd.choice([0, 1, 2])
        elif kind == "wildcard":
            toks = ["".join(rnd.choices(string.ascii_lowercase[:6] + "%_",
                                        k=rnd.randint(1, 5)))
                    for _ in range(4)]
            edits = plen = 0
        elif kind == "regexp":
            toks = [rnd.choice(["ab.*", "[ab]+c", "a{1,2}b", "..c"])]
            edits = plen = 0
        else:
            toks = ["".join(rnd.choices(string.ascii_lowercase[:6],
                                        k=rnd.randint(1, 3)))
                    for _ in range(4)]
            edits = plen = 0
        _ab(idx, sorted(set(toks)), kind, edits, plen,
            rnd.choice([3, 10, 50]))


def test_handle_df_cache_refresh(fat_vocab_index):
    idx = fat_vocab_index
    idx.postings  # populates the per-handle table memo
    first = idx._df_cache.get("postings")
    assert first is not None
    idx.postings
    assert idx._df_cache.get("postings") is first  # memo hit, no re-read
    idx.refresh()
    assert idx._df_cache == {} and idx._vocab_cache is None
