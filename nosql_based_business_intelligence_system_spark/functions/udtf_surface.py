"""Python UDTF surface (SURVEY.md §2.9).

The reference has no UDTF anywhere (its row expansions are pandas reshapes);
Spark 4 adds Python UDTFs as the user-extensible table-function escape
hatch. This module keeps ONE canonical exemplar — a tokenizer that emits
(pos, token) rows — together with the native plan it is equivalent to, and
the equivalence is pytest-asserted (tests/test_udtf.py).

The point the pairing makes: a UDTF runs row-at-a-time in a Python worker
(no codegen, pickled row traffic), so the production path for anything
expressible as expressions is the native ``posexplode``/``explode`` form;
the UDTF form exists for logic that genuinely needs imperative Python per
input row (stateful emission, external libraries). Register the UDTF only
at that boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="pos int, token string")
class TokenizeUdtf:
    """Emit one (position, token) row per whitespace token of the input.

    NULL input emits no rows — matching the native twin, where
    ``posexplode`` over ``split(NULL)`` also drops the row.
    """

    def eval(self, text: str | None):  # noqa: D102 — contract is the class doc
        if text is None:
            return
        for i, tok in enumerate(text.split()):
            yield i, tok


def tokens_with_positions_native(
    df: DataFrame, text_col: str, *carry: str
) -> DataFrame:
    """The production twin: whole-stage-codegen split + posexplode.

    ``split`` on ``\\s+`` with leading/trailing trim matches str.split()'s
    behavior of discarding empty strings at the boundaries.
    """
    parts = F.split(F.trim(F.col(text_col)), r"\s+")
    # str.split() on an empty/whitespace-only string yields []; Spark's
    # split("") yields [""] — filter the lone empty token to match.
    parts = F.filter(parts, lambda t: t != "")
    out = df.select(*carry, F.posexplode(parts).alias("pos", "token"))
    return out


def tokens_with_positions_udtf(
    spark, df: DataFrame, text_col: str, *carry: str
) -> DataFrame:
    """Same rows via the UDTF, applied with a LATERAL join."""
    spark.udtf.register("tokenize_udtf", TokenizeUdtf)
    df.createOrReplaceTempView("__udtf_in")
    cols = ", ".join(f"d.{c}" for c in carry)
    sel = f"{cols}, t.pos, t.token" if cols else "t.pos, t.token"
    return spark.sql(
        f"SELECT {sel} FROM __udtf_in d, LATERAL tokenize_udtf(d.{text_col}) t"
    )


# --- grouped-aggregate UDF (the UDAF slot of the §2.9 matrix) ----------------


def geo_mean_udaf():
    """Geometric mean as an Arrow-batched grouped-aggregate pandas UDF —
    the user-defined AGGREGATE escape hatch (scalar = pandas_udf in
    bpe_encode, grouped-map = mapInPandas in multimodal, table = TokenizeUdtf
    above). Built lazily because pandas_udf resolves its type hints at
    decoration time — and with ``from __future__ import annotations`` those
    hints are STRINGS resolved against this module's globals, so ``pd``
    must live there (same constraint bpe_encode documents)."""
    global pd
    import pandas as pd  # noqa: PLW0603 — see docstring

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:  # type: ignore[name-defined]
        import numpy as np

        vals = v.dropna()
        vals = vals[vals > 0]
        if not len(vals):
            return float("nan")
        return float(np.exp(np.log(vals.astype("float64")).mean()))

    return geo_mean


def geo_mean_native(col: str):
    """The production twin: exp(avg(ln(x))) over positives — whole-stage
    codegen with map-side partial aggregation, which the pandas UDAF (full
    group values shipped to Python) gives up. Use the UDAF form only when
    the aggregate genuinely can't be phrased in expressions."""
    x = F.col(col)
    pos = F.when(x > 0, x)
    return F.exp(F.avg(F.log(pos)))
