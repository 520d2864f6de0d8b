"""Single-process BM25 oracle (SURVEY §5.2).

The sandbox stand-in for "Anserini-style BM25 reference on its MS MARCO-style
query set": same tokenizer as the engine (byte-identical, analysis.py), Lucene
idf ln(1+(N-df+0.5)/(df+0.5)), k1=0.9 b=0.4, qtf multiplier, per-doc score
summed in ascending-term order (the engine's canonical order), tie-break
(score DESC, doc_id ASC). Pure Python + math — no numpy reassociation.
"""

from __future__ import annotations

import math
from collections import Counter

from openmatch_spark.analysis import tokenize_py
from openmatch_spark.functions.bm25 import B, K1


class BM25Oracle:
    def __init__(self, docs: dict[str, str], analyzer: str = "dpr",
                 k1: float = K1, b: float = B):
        self.analyzer = analyzer
        self.k1, self.b = k1, b
        self.tf: dict[str, Counter] = {}
        self.doclen: dict[str, int] = {}
        self.df: Counter = Counter()
        for doc_id, text in docs.items():
            terms = tokenize_py(text, analyzer)
            c = Counter(terms)
            self.tf[doc_id] = c
            self.doclen[doc_id] = len(terms)
            for t in c:
                self.df[t] += 1
        self.n_docs = len(docs)
        self.avgdl = (sum(self.doclen.values()) / self.n_docs) if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def weight(self, term: str, doc_id: str) -> float:
        tf = self.tf[doc_id].get(term, 0)
        if tf == 0:
            return 0.0
        dl = self.doclen[doc_id]
        return self.idf(term) * tf / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl))

    def search(self, query: str, k: int = 10, remove_identical_qid: str | None = None):
        """[(doc_id, score, rank)] — only docs matching >=1 query term."""
        qterms = Counter(tokenize_py(query, self.analyzer))
        scores: dict[str, float] = {}
        for term in sorted(qterms):  # canonical ascending-term sum order
            if term not in self.df:
                continue
            qtf = qterms[term]
            for doc_id, c in self.tf.items():
                if term in c:
                    scores[doc_id] = scores.get(doc_id, 0.0) + qtf * self.weight(term, doc_id)
        if remove_identical_qid is not None:
            scores.pop(remove_identical_qid, None)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(d, s, i + 1) for i, (d, s) in enumerate(ranked)]

    def run(self, queries: dict[str, str], k: int = 10):
        """{qid: [(doc_id, score, rank)]} over the whole query set."""
        return {qid: self.search(q, k) for qid, q in queries.items()}
