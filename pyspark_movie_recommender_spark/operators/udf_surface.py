"""The engine's Python-UDF surface — every form is Arrow-batched.

Policy (SURVEY.md §2.B): built-in SQL functions are the hot path; when
Python is unavoidable the ONLY sanctioned forms are the vectorized ones
below. Row-at-a-time ``F.udf`` (the reference's C2 vector-wrapper at
``recommender.py:200-201``) is banned from the engine — it serializes
per row and blocks codegen.

Forms:
- scalar ``pandas_udf``        — Series → Series, Arrow batches;
- grouped-agg ``pandas_udf``   — Series → scalar per group (UDAF);
- ``applyInPandas``            — per-group DataFrame → DataFrame
  (see also operators/asof.py merge_asof_pandas);
- ``mapInPandas``              — per-partition batch iterator
  (see operators/multimodal.py decode_and_featurize);
- ``udtf``                     — table function, one row in → N rows out;
- cogrouped ``applyInPandas``  — two grouped DataFrames, per-key pair of
  frames → DataFrame (``cogrouped_user_reconciliation``);
- ``mapInArrow``               — per-partition RecordBatch iterator,
  zero-copy Arrow-native (``arrow_doc_stats``);
- grouped ``applyInArrow``     — per-group pyarrow Table → Table
  (``arrow_grouped_lang_stats``);
- polymorphic ``udtf``         — output schema computed per call site
  by the static ``analyze`` hook (``make_kv_columns_udtf``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def sigmoid_scale(s: pd.Series) -> pd.Series:
    """Scalar pandas UDF: logistic squash — whole Arrow batches, ~10-100x
    a row-at-a-time UDF. (Only exists as a UDF to exercise the surface;
    expressible in SQL as 1/(1+exp(-x)).)"""
    import numpy as np

    return 1.0 / (1.0 + np.exp(-s))


@F.pandas_udf(T.DoubleType())
def gini_udaf(v: pd.Series) -> float:
    """Grouped-aggregate pandas UDF (UDAF): Gini coefficient of a value
    column per group — a metric with no built-in SQL aggregate."""
    import numpy as np

    x = np.sort(v.to_numpy(dtype="float64"))
    n = len(x)
    if n == 0 or x.sum() == 0:
        return 0.0
    cum = np.cumsum(x)
    return float((n + 1 - 2 * (cum / cum[-1]).sum()) / n)


def spend_gini_per_segment(customer: DataFrame) -> DataFrame:
    """Inequality of account balances per market segment via the UDAF.

    Spark disallows mixing pandas UDAFs with JVM aggregates in one agg
    ([INVALID_PANDAS_UDF_PLACEMENT]) — so the count comes from a second
    aggregate joined on the group key (both sides share the same
    shuffle partitioning, so the join is exchange-free).
    """
    gini = customer.groupBy("c_mktsegment").agg(
        gini_udaf(F.col("c_acctbal")).alias("acctbal_gini")
    )
    counts = customer.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    return gini.join(counts, "c_mktsegment")


def zscore_per_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """applyInPandas: per-group standardization (group → pandas frame →
    group). Groups must fit in executor memory — fine for per-key
    slices, never applied to an unpartitioned relation."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("zscore", T.DoubleType(), True)]
    )

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf[value_col].std(ddof=0)
        mu = pdf[value_col].mean()
        pdf = pdf.copy()
        pdf["zscore"] = 0.0 if (sd == 0 or pd.isna(sd)) else (pdf[value_col] - mu) / sd
        return pdf

    return df.groupBy(group_col).applyInPandas(standardize, schema=out_schema)


def make_explode_ngrams_udtf():
    """UDTF: one document row in → one row per word n-gram out.

    Spark 3.5+ ``@udtf`` — the table-function escape hatch for
    fan-out transforms that need Python. (Word n-grams themselves are
    also expressible with SQL transform+slice; the UDTF form exists to
    exercise the surface.) ``useArrow=True`` keeps the exchange on the
    Arrow batch path (ArrowEvalPythonUDTF) rather than pickled rows —
    the same rule as every other Python boundary in the engine.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, ngram string", useArrow=True)
    class ExplodeNGrams:
        def eval(self, doc_id: int, text: str, n: int):
            toks = (text or "").split()
            for i in range(max(len(toks) - n + 1, 0)):
                yield doc_id, i, " ".join(toks[i : i + n])

    return ExplodeNGrams


@F.pandas_udf(T.DoubleType())
def jaro_winkler(s1: pd.Series, s2: pd.Series) -> pd.Series:
    """Scalar pandas UDF: Jaro-Winkler similarity (prefix weight 0.1,
    boost threshold 0.7 — the standard parameterization, matching
    DuckDB's ``jaro_winkler_similarity`` bit-for-bit on real name
    pairs, which is how the oracle gate checks this UDF's VALUES, not
    just its row count — rare for a Python UDF).

    Spark has no built-in JW (only levenshtein), so this is a
    legitimate UDF hot path: O(len²) per pair with early exits, looped
    per Arrow batch. Feed it BLOCKED candidate pairs (see
    jaro_winkler_name_pairs) — never a raw cross join.
    """

    def jaro(a: str, b: str) -> float:
        l1, l2 = len(a), len(b)
        if l1 == 0 or l2 == 0:
            # DuckDB convention: any empty side (including both) scores 0.0
            return 0.0
        win = max(max(l1, l2) // 2 - 1, 0)
        m1 = [False] * l1
        m2 = [False] * l2
        m = 0
        for i, ch in enumerate(a):
            for j in range(max(0, i - win), min(l2, i + win + 1)):
                if not m2[j] and b[j] == ch:
                    m1[i] = m2[j] = True
                    m += 1
                    break
        if m == 0:
            return 0.0
        t = 0
        k = 0
        for i in range(l1):
            if m1[i]:
                while not m2[k]:
                    k += 1
                if a[i] != b[k]:
                    t += 1
                k += 1
        t //= 2
        return (m / l1 + m / l2 + (m - t) / m) / 3.0

    def jw(a: str, b: str) -> float:
        j = jaro(a, b)
        if j > 0.7:
            ell = 0
            for x, y in zip(a[:4], b[:4]):
                if x != y:
                    break
                ell += 1
            j = j + ell * 0.1 * (1.0 - j)
        return j

    return pd.Series(
        [jw(a, b) for a, b in zip(s1, s2)], dtype="float64"
    )


def cogrouped_user_reconciliation(
    events: DataFrame, orders: DataFrame
) -> DataFrame:
    """Co-grouped ``applyInPandas``: the LAST sanctioned Python-UDF
    form — two DataFrames grouped on the same key, each key's pair of
    pandas frames handed to one function (the per-key two-sided
    merge/compare primitive: reconciliation, per-key merge_asof,
    distribution drift tests).

    Here: reconcile each user's EVENT activity against their ORDER
    history in one pass — counts and integer-cents sums from both
    sides (exact arithmetic, so the cross-engine oracle checks the
    cogroup plumbing value-for-value, like the Jaro-Winkler UDF).

    Scale shape: both sides hash-partition on the key (the same
    exchange a join would need — cogroup adds no extra shuffle); each
    key's pair of frames must fit in one Arrow batch, which holds for
    per-user activity but NOT for corpus-wide keys — that's the
    documented cogroup contract, same as any applyInPandas.
    """

    def recon(key, ev: pd.DataFrame, od: pd.DataFrame) -> pd.DataFrame:
        ev_cents = (
            (ev["value"] * 100 + 0.5).pipe(np_floor_int64).sum()
            if len(ev)
            else 0
        )
        od_cents = (
            (od["o_totalprice"] * 100 + 0.5).pipe(np_floor_int64).sum()
            if len(od)
            else 0
        )
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [len(ev)],
                "n_orders": [len(od)],
                "event_cents": [int(ev_cents)],
                "order_cents": [int(od_cents)],
            }
        )

    def np_floor_int64(s: pd.Series):
        import numpy as np

        return pd.Series(np.floor(s.to_numpy(dtype="float64")).astype("int64"))

    ev = events.select(F.col("user_id"), "value")
    od = orders.select(F.col("o_custkey").alias("user_id"), "o_totalprice")
    return (
        ev.groupBy("user_id")
        .cogroup(od.groupBy("user_id"))
        .applyInPandas(
            recon,
            schema=(
                "user_id long, n_events long, n_orders long, "
                "event_cents long, order_cents long"
            ),
        )
    )


def arrow_doc_stats(docs: DataFrame) -> DataFrame:
    """``mapInArrow``: per-partition iterator of *pyarrow RecordBatches*
    — the zero-copy tier below mapInPandas (no Arrow→pandas conversion,
    no object boxing). The right boundary when the Python side is
    itself Arrow-native (pyarrow.compute kernels, Arrow-backed
    tokenizers, Lance/Vortex readers).

    Computes per-doc token count (single-space split) and byte length
    entirely with pyarrow.compute kernels — columnar in, columnar out,
    value-identical to the SQL spec ``size(split(text,' '))`` /
    ``octet_length(text)``, which is how the oracle gate verifies an
    Arrow-native UDF's VALUES.

    Scale shape: pure map-side — no shuffle, batches stream through
    bounded memory; output schema is fixed so Catalyst can plan the
    downstream agg normally.
    """

    def stats(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            text = b.column(b.schema.get_field_index("text"))
            toks = pc.split_pattern(text, pattern=" ")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("doc_id")),
                    pc.cast(pc.list_value_length(toks), pa.int64()),
                    pc.cast(pc.binary_length(text), pa.int64()),
                ],
                names=["doc_id", "n_tokens", "n_bytes"],
            )

    return docs.select("doc_id", "text").mapInArrow(
        stats, schema="doc_id long, n_tokens long, n_bytes long"
    )


def arrow_grouped_lang_stats(docs: DataFrame) -> DataFrame:
    """Grouped ``applyInArrow``: per-group *pyarrow Table* → Table —
    the Arrow-native twin of applyInPandas for group-shaped Python
    (per-language tokenizer fitting, per-source schema inference).

    Aggregates per language with pyarrow.compute only: doc count,
    total chars, total tokens. Exact integers → oracle-checkable.

    Scale shape: one hash exchange on lang (identical to a groupBy);
    each group must fit in one Arrow table — holds for per-language
    corpus STATS here because the input is pre-projected to 3 narrow
    columns, and the contract is documented, same as applyInPandas.
    """

    def per_lang(table):
        import pyarrow as pa
        import pyarrow.compute as pc

        toks = pc.split_pattern(table.column("text"), pattern=" ")
        return pa.table(
            {
                "lang": [table.column("lang")[0].as_py()],
                "n_docs": [table.num_rows],
                "total_chars": [
                    pc.sum(pc.binary_length(table.column("text"))).as_py()
                ],
                "total_tokens": [pc.sum(pc.list_value_length(toks)).as_py()],
            },
            schema=pa.schema(
                [
                    ("lang", pa.string()),
                    ("n_docs", pa.int64()),
                    ("total_chars", pa.int64()),
                    ("total_tokens", pa.int64()),
                ]
            ),
        )

    return (
        docs.select("lang", "text")
        .groupBy("lang")
        .applyInArrow(
            per_lang,
            schema="lang string, n_docs long, total_chars long, total_tokens long",
        )
    )


def make_kv_columns_udtf():
    """POLYMORPHIC UDTF: the output schema is computed per CALL SITE by
    the static ``analyze`` hook from a constant argument — here, a
    comma-separated key list becomes one LONG column per key. The
    Spark 4 table-function tier above the fixed-schema UDTF: schema
    decided at plan time, rows produced at run time (the shape behind
    dynamic pivots / configurable feature extractors).
    """
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf(useArrow=True)
    class KvColumns:
        @staticmethod
        def analyze(json_str: AnalyzeArgument, keys: AnalyzeArgument):
            if not keys.isConstantExpression:
                raise Exception("keys must be a constant string")
            schema = StructType()
            for k in str(keys.value).split(","):
                schema = schema.add(k.strip(), LongType())
            return AnalyzeResult(schema=schema)

        def __init__(self, analyze_result=None):
            self._keys = (
                [f.name for f in analyze_result.schema.fields]
                if analyze_result is not None
                else None
            )

        def eval(self, json_str: str, keys: str):
            import json as _json

            ks = self._keys or [k.strip() for k in keys.split(",")]
            try:
                d = _json.loads(json_str or "{}")
            except ValueError:
                d = {}
            yield tuple(
                int(d[k]) if isinstance(d.get(k), (int, float)) else None
                for k in ks
            )

    return KvColumns
