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
