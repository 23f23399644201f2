"""Vectorized Pandas-UDF surface (SURVEY.md §2 C13).

The engine's policy is builtin-expressions-first; this module exists to
prove the Arrow-batched slow path works end-to-end when it is genuinely
needed (custom scoring models, tokenizers).  The example UDF reimplements
the exact arithmetic of operators.text_analysis.quality_score so its output
is bit-comparable against both the expression version and the DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from logspout_kinesis_tests_spark.operators.text_analysis import STOPWORDS

_STOP = set(STOPWORDS)


@pandas_udf(DoubleType())
def quality_score_udf(text: pd.Series) -> pd.Series:
    """score = 0.4·min(1, n/50) + 0.3·(stopword_types/8) + 0.3·(distinct/n).

    Same formula and evaluation order as the codegen version — IEEE doubles
    make the results identical; any drift indicates an Arrow transport bug.
    """

    def score(t: str) -> float:
        words = t.lower().split(" ")
        n = float(len(words))
        distinct = set(words)
        n_stop = float(len(distinct & _STOP))
        n_distinct = float(len(distinct))
        return 0.4 * min(1.0, n / 50.0) + 0.3 * (n_stop / 8.0) + 0.3 * (n_distinct / n)

    return text.map(score)


def fake_embed_batches(batch_dim: int = 4):
    """Build a ``mapInPandas`` function that attaches a deterministic
    ``batch_dim``-float "embedding" per document — the Arrow-batched MODEL
    INFERENCE pattern (iterator of pandas batches in, iterator out: exactly
    how a real encoder runs on executors, one model per task, batches
    streamed through it without materializing the partition).

    The "model" is an md5-derived fake — component ``i`` is byte ``i`` of
    ``md5(text)`` scaled by 1/256, an exact binary fraction — so the whole
    inference path is reproducible everywhere AND expressible in the DuckDB
    oracle: the plumbing (schema, batch iteration, Arrow transfer) is real
    and hash-verified, only the weights are fake.  Swap ``_infer`` for a
    real encoder and nothing else changes.
    """
    import hashlib

    def _infer(texts: pd.Series) -> list[list[float]]:
        out = []
        for t in texts:
            digest = hashlib.md5((t or "").encode("utf-8")).digest()
            out.append([digest[i] / 256.0 for i in range(batch_dim)])
        return out

    def run(batches):
        for pdf in batches:
            vecs = _infer(pdf["text"])
            res = pdf[["doc_id"]].copy()
            for i in range(batch_dim):
                res[f"e{i}"] = [v[i] for v in vecs]
            yield res

    return run


EMBED_SCHEMA_4 = "doc_id long, e0 double, e1 double, e2 double, e3 double"
