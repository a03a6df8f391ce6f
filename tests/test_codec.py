"""Varint/delta codec round-trip — property-style over random posting
lists (SURVEY.md §5 item 1)."""

import numpy as np
import pytest

from meilibridge_spark.functions.codec import (
    decode_block,
    decode_varints,
    encode_blocks,
    encode_varints,
)


def test_varint_known_values():
    vals = np.array([0, 1, 127, 128, 300, 16383, 16384, 2**32, 2**63 - 1], dtype=np.uint64)
    buf = encode_varints(vals)
    assert encode_varints(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert encode_varints(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert encode_varints(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    np.testing.assert_array_equal(decode_varints(buf), vals)


def test_varint_empty():
    assert encode_varints(np.array([], dtype=np.uint64)) == b""
    assert decode_varints(b"").size == 0


@pytest.mark.parametrize("seed", range(5))
def test_varint_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 5000))
    # mixed magnitudes to exercise all byte widths
    vals = (rng.integers(0, 2**62, size=n).astype(np.uint64)) >> rng.integers(
        0, 60, size=n
    ).astype(np.uint64)
    buf = encode_varints(vals)
    np.testing.assert_array_equal(decode_varints(buf), vals)


@pytest.mark.parametrize("seed,block_size", [(0, 128), (1, 128), (2, 8), (3, 2)])
def test_block_roundtrip_random(seed, block_size):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 2000))
    doc_ids = np.cumsum(rng.integers(1, 1000, size=n)).astype(np.int64)
    tfs = rng.integers(1, 50, size=n).astype(np.int64)
    dls = rng.integers(1, 200, size=n).astype(np.int64)
    blocks = encode_blocks(doc_ids, tfs, dls, block_size)
    assert sum(b["n"] for b in blocks) == n
    got_d, got_t, got_l = [], [], []
    for b in blocks:
        d, t, dl = decode_block(b["first_doc"], b["docs_bin"], b["tfs_bin"], b["dls_bin"])
        assert d.size == b["n"] == t.size == dl.size
        assert d[0] == b["first_doc"] and d[-1] == b["last_doc"]
        assert t.max() == b["max_tf"] and dl.min() == b["min_dl"]
        assert t.sum() == b["sum_tf"]
        got_d.append(d)
        got_t.append(t)
        got_l.append(dl)
    np.testing.assert_array_equal(np.concatenate(got_d), doc_ids)
    np.testing.assert_array_equal(np.concatenate(got_t), tfs)
    np.testing.assert_array_equal(np.concatenate(got_l), dls)


def test_blocks_reject_unsorted():
    with pytest.raises(ValueError):
        encode_blocks(
            np.array([3, 2], dtype=np.int64),
            np.array([1, 1], dtype=np.int64),
            np.array([1, 1], dtype=np.int64),
            128,
        )


def test_encoding_is_content_deterministic():
    # byte-identity under re-encode: the resume test relies on this
    doc_ids = np.array([5, 9, 1000, 100000], dtype=np.int64)
    tfs = np.array([1, 2, 3, 4], dtype=np.int64)
    dls = np.array([10, 20, 30, 40], dtype=np.int64)
    a = encode_blocks(doc_ids, tfs, dls, 2)
    b = encode_blocks(doc_ids.copy(), tfs.copy(), dls.copy(), 2)
    assert a == b
