"""Binary-quantized embedders (Meilisearch v1.10 ``binaryQuantized``):
sign-bit quantization packed 32 dims per long word
(``similarity.binary_quantize``) and Hamming top-k scoring
(``similarity.binary_ann_topk`` — bit_count(xor) JVM-side, the +/-1
dot product (dim - 2*hamming)/dim as the score), with the two-stage
bit-scan -> exact-cosine rerank recipe. Verified bit-exactly against a
numpy reference, plus the config setting surface."""

import numpy as np
import pytest

from meilibridge_spark.operators.similarity import (
    binary_ann_topk,
    binary_quantize,
    cosine_topk,
)

DIM = 40  # deliberately not a multiple of 32: exercises the tail word
N = 60


def _vectors():
    rng = np.random.default_rng(7)
    v = rng.normal(size=(N, DIM)).astype(np.float64)
    v[3] = 0.0  # zero vector: all bits 0, still scoreable by Hamming
    return v


@pytest.fixture(scope="module")
def emb(spark):
    v = _vectors()
    return spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(v)],
        "vec_id long, embedding array<double>",
    ).cache()


def _np_pack(v):
    bits = (v > 0).astype(np.int64)
    words = []
    for w in range((DIM + 31) // 32):
        chunk = bits[w * 32 : (w + 1) * 32]
        words.append(int((chunk * (1 << np.arange(len(chunk)))).sum()))
    return words


def test_packed_bits_match_numpy(emb):
    v = _vectors()
    got = {
        r["vec_id"]: list(r["bits"])
        for r in binary_quantize(emb, DIM).collect()
    }
    for i, row in enumerate(v):
        assert got[i] == _np_pack(row), f"vec {i}"
    # tail word never sees bits past dim
    assert all(b[-1] < (1 << (DIM - 32)) for b in got.values())


def _np_hamming_topk(v, q_ids, k):
    signs = v > 0
    out = {}
    for qi in q_ids:
        h = (signs != signs[qi]).sum(axis=1)
        order = sorted(
            (int(h[i]), i) for i in range(N) if i != qi
        )
        out[qi] = order[:k]
    return out


def test_binary_topk_matches_numpy(emb):
    v = _vectors()
    q = emb.filter("vec_id < 3").selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )
    rows = binary_ann_topk(emb, q, DIM, k=5).collect()
    want = _np_hamming_topk(v, [0, 1, 2], 5)
    for qi in (0, 1, 2):
        got = sorted(
            (r["rank"], r["vec_id"], r["score"])
            for r in rows
            if r["query_id"] == qi
        )
        assert [g[1] for g in got] == [i for _, i in want[qi]], f"q{qi}"
        for (rank, vid, score), (h, _) in zip(got, want[qi]):
            assert score == round((DIM - 2 * h) / DIM, 6)


def test_rerank_pool_equals_exact_cosine_when_full(emb):
    # rerank over ALL candidates == the exact cosine top-k
    q = emb.filter("vec_id = 5").selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )
    exact = cosine_topk(emb, q, k=4).collect()
    reranked = binary_ann_topk(
        emb, q, DIM, k=4, rerank_pool=N
    ).collect()
    assert [(r["vec_id"], r["cos"]) for r in sorted(reranked, key=lambda r: r["rank"])] == [
        (r["vec_id"], r["cos"]) for r in sorted(exact, key=lambda r: r["rank"])
    ]


def test_rerank_candidates_come_from_bit_scan(emb):
    # with a small pool, every reranked hit must be a bit-scan survivor
    q = emb.filter("vec_id = 9").selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )
    pool_rows = binary_ann_topk(emb, q, DIM, k=8).collect()
    pool = {r["vec_id"] for r in pool_rows}
    reranked = binary_ann_topk(emb, q, DIM, k=3, rerank_pool=8).collect()
    assert {r["vec_id"] for r in reranked} <= pool
    assert len(reranked) == 3


def test_validation(emb):
    q = emb.limit(1).selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )
    with pytest.raises(ValueError, match="rerank_pool"):
        binary_ann_topk(emb, q, DIM, k=5, rerank_pool=3)
    with pytest.raises(ValueError, match="dim"):
        binary_quantize(emb, 0)


def test_config_setting():
    import dataclasses

    from meilibridge_spark.config import ConfigError, IndexConfig

    base = IndexConfig(index_name="bq", embedders=(("default", 4),))
    ok = dataclasses.replace(
        base, binary_quantized_embedders=("default",)
    )
    ok.validate()
    back = IndexConfig.from_json_dict(ok.to_json_dict())
    assert back.binary_quantized_embedders == ("default",)
    with pytest.raises(ConfigError, match="missing"):
        dataclasses.replace(
            base, binary_quantized_embedders=("nope",)
        ).validate()
    with pytest.raises(ConfigError, match="duplicate"):
        dataclasses.replace(
            base, binary_quantized_embedders=("default", "default")
        ).validate()
