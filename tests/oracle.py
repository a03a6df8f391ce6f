"""Pinned pure-Python BM25 oracle (FIXTURES.md §5, SURVEY.md §5).

Deliberately independent of the engine's postings/codec/WAND machinery:
plain dicts + math over the shared tokenizer, so a rank-identity match
between the Spark engine and this oracle validates the whole index
build + query pipeline. k1=1.2, b=0.75; tie-break ascending doc_id;
scores compared at 1e-9 rounding.
"""

from __future__ import annotations

import math
from collections import Counter

from meilibridge_spark.config import DEFAULT_B, DEFAULT_K1, AnalyzerConfig
from meilibridge_spark.functions.tokenizer import parse_query, tokenize


class BM25Oracle:
    def __init__(
        self,
        docs: "list[tuple[int, str]]",
        cfg: AnalyzerConfig,
        k1: float = DEFAULT_K1,
        b: float = DEFAULT_B,
    ) -> None:
        self.cfg = cfg
        self.k1 = k1
        self.b = b
        self.tf: dict[int, Counter] = {}
        self.dl: dict[int, int] = {}
        for doc_id, text in docs:
            toks = tokenize(text, cfg)
            self.tf[doc_id] = Counter(toks)
            self.dl[doc_id] = len(toks)
        self.N = len(self.tf)
        self.avgdl = (sum(self.dl.values()) / self.N) if self.N else 0.0
        self.df: Counter = Counter()
        for c in self.tf.values():
            self.df.update(c.keys())

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.N - df + 0.5) / (df + 0.5))

    def score(self, doc_id: int, terms: "list[str]") -> float:
        s = 0.0
        dl = self.dl[doc_id]
        for t in terms:
            tf = self.tf[doc_id].get(t, 0)
            if tf == 0:
                continue
            denom = tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
            s += self.idf(t) * tf * (self.k1 + 1.0) / denom
        return s

    def topk(self, query: str, k: int) -> "list[tuple[int, float]]":
        terms = parse_query(query, self.cfg)
        if not terms:
            return []
        hits = []
        for doc_id in self.tf:
            if any(self.tf[doc_id].get(t, 0) for t in terms):
                hits.append((doc_id, self.score(doc_id, terms)))
        hits.sort(key=lambda kv: (-kv[1], kv[0]))
        return hits[:k]
