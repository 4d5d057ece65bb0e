"""Python UDTF surface (SURVEY.md §2.10): table-valued functions that
expand one input row into many output rows with per-row Python state.

The reference's engine exposes a UDTF-shaped op only implicitly (its
transform explodes plays into per-day rows, REF/glue_jobs/transform.py);
Spark 4 makes the surface explicit with ``@udtf``. One demonstration
function lives here — tokenization with first-occurrence tagging — chosen
because the per-doc running state (a seen-set while emitting) is the thing
a plain ``posexplode`` projection can NOT express without a second window
pass, i.e. it exercises what the UDTF surface is actually FOR.

Scale posture: a Python UDTF is row-at-a-time (pickled rows over the
socket, no Arrow batching in the emit path) — it is the SLOW path, kept
off hot queries. The equivalent built-in plan (posexplode + row_number
window) is implemented alongside; tests assert row-for-row equality, and
100 TB corpus accounting should use the built-in. The UDTF registers as an
oracle-checked query to pin the surface's semantics, not its throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="pos: bigint, token: string, first_occurrence: boolean")
class TokenizeWithFirstSeen:
    """Emit (pos, token, first_occurrence) for each whitespace token of one
    document; ``first_occurrence`` flips off the second time a token string
    recurs WITHIN the document (streamed seen-set — O(distinct tokens)
    state, emitted in position order)."""

    def eval(self, text: str):  # noqa: D102 — contract fixed by Spark
        seen: set[str] = set()
        for pos, tok in enumerate((text or "").split(" ")):
            if tok == "":
                continue
            first = tok not in seen
            seen.add(tok)
            yield pos, tok, first


def tokenize_first_seen_udtf(spark: SparkSession, docs: DataFrame,
                             id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """Lateral-join the UDTF over a documents frame → (doc_id, pos, token,
    first_occurrence). SQL LATERAL is the join shape: the UDTF runs once
    per input row, its emitted rows pair with that row's ``id_col``."""
    spark.udtf.register("tokenize_first_seen", TokenizeWithFirstSeen)
    docs.select(id_col, text_col).createOrReplaceTempView("_udtf_docs_in")
    return spark.sql(f"""
        SELECT d.{id_col}, t.pos, t.token, t.first_occurrence
        FROM _udtf_docs_in d, LATERAL tokenize_first_seen(d.{text_col}) t
    """)


def tokenize_first_seen_builtin(docs: DataFrame, id_col: str = "doc_id",
                                text_col: str = "text") -> DataFrame:
    """The JVM-side equivalent of :class:`TokenizeWithFirstSeen` — narrow
    posexplode, then first-occurrence via a min-position window keyed by
    (doc, token). One hash exchange; this is the 100 TB path."""
    toks = F.split(F.col(text_col), " ")
    ex = (docs.select(id_col, F.posexplode(toks).alias("pos", "token"))
          .where(F.col("token") != ""))
    first_pos = F.min("pos").over(Window.partitionBy(id_col, "token"))
    return ex.select(
        id_col, "pos", "token",
        (F.col("pos") == first_pos).alias("first_occurrence"))
