"""Composed training-data curation pipeline (Tier X, SURVEY §2.3).

One declarative pass wiring the individual operators together the way a
pretraining data pipeline does: exact-dedup -> quality score -> repetition
filters -> survivors. Because every stage is a DataFrame expression, the
whole pipeline is ONE Catalyst plan — filters fuse, the text column is
read once, and the only shuffles are the two fingerprint/n-gram
aggregates. No reference analogue (cl-data-frame.lisp has no text
surface); the composition itself is the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..frame import SparkFrame
from .dedup import normalized_fingerprint
from .textstats import quality_score, repetition_stats


def _plain(frame) -> DataFrame:
    return frame.spark_df if isinstance(frame, SparkFrame) else frame


def pipeline_filter(frame, id_col: str = "doc_id", text_col: str = "text",
                    min_quality: float = 0.5, min_ttr: float = 0.4,
                    max_top_bigram: float = 0.5) -> SparkFrame:
    """Documents surviving the full curation pipeline:

    1. exact dedup on the whitespace/case-normalized fingerprint
       (min-id winner per group),
    2. composite quality score >= ``min_quality``,
    3. type-token ratio >= ``min_ttr`` and top-bigram share <=
       ``max_top_bigram`` (repetition/boilerplate gate).

    Output: (id, lang, quality, ttr, top_bigram_frac) per keeper.

    Scale shape: the dedup winner set is a (fingerprint -> min id)
    aggregate joined back by id; quality is a pure projection; the
    repetition gate reuses ``repetition_stats``'s partial-aggregating
    explode. Everything else fuses into the scan.
    """
    sdf = _plain(frame)
    fp = sdf.select(F.col(id_col),
                    normalized_fingerprint(F.col(text_col)).alias("__fp__"))
    winners = (fp.groupBy("__fp__").agg(F.min(id_col).alias(id_col))
               .select(id_col))
    rep = _plain(repetition_stats(frame, id_col, text_col)).select(
        id_col, "ttr", "top_bigram_frac")
    out = (sdf
           .join(winners, on=id_col, how="left_semi")
           .select(id_col, "lang",
                   quality_score(F.col(text_col)).alias("quality"))
           .filter(F.col("quality") >= min_quality)
           .join(rep, on=id_col)
           .filter((F.col("ttr") >= min_ttr)
                   & (F.coalesce("top_bigram_frac", F.lit(0.0))
                      <= max_top_bigram)))
    return SparkFrame(out)
