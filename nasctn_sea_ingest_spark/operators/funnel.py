"""Generic anchored funnel analysis — the library form of corpus
q160's fixed three-step funnel (`plans/corpus_r7.py`), for ANY number
of steps: per user, the FIRST event matching step 1, then for each
later step the first matching event AFTER the previous step's anchor
(optionally within a time bound).  The conversion query every growth
dashboard runs, shaped to survive scale.

No referent in the reference repo; beyond-reference surface.

Scale shape: one filtered hash aggregate per step (first qualifying
event per user) plus one user-keyed EQUI-join per transition, with the
time bounds as post-join FILTERS — never a time-range theta join,
which Spark would plan as a broadcast nested-loop over the raw event
stream (the q160 contract).  The per-user anchor frame stays one row
per user throughout; steps iterate in Python over a small list, so the
plan depth is O(#steps), not O(events).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def funnel_anchors(events: DataFrame, steps: "list[tuple[str, str]]",
                   user_col: str = "user_id", ts_col: str = "ts_us",
                   within_us: int | None = None) -> DataFrame:
    """Per-user step anchor times: ``(user, t_<step1>, t_<step2>, ...)``
    where ``t_<name>`` is the FIRST ``ts_col`` of an event matching that
    step's SQL predicate STRICTLY AFTER the previous step's anchor
    (and, when ``within_us`` is set, no more than that many ticks
    after).  NULL from the first missed step onward.  ``steps`` is
    ``[(name, sql_predicate), ...]`` — predicates are arbitrary SQL
    over the event row."""
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    names = [n for n, _ in steps]
    if len(set(names)) != len(names):
        raise ValueError("step names must be unique")
    name0, pred0 = steps[0]
    anchors = (events.where(F.expr(pred0))
               .groupBy(F.col(user_col).alias("__u"))
               .agg(F.min(ts_col).alias(f"t_{name0}")))
    prev = f"t_{name0}"
    for name, pred in steps[1:]:
        cond = F.col("__ts") > F.col("__prev")
        if within_us is not None:
            cond = cond & (F.col("__ts")
                           <= F.col("__prev") + F.lit(int(within_us)))
        nxt = (events.where(F.expr(pred))
               .select(F.col(user_col).alias("__u"),
                       F.col(ts_col).alias("__ts"))
               .join(anchors.where(F.col(prev).isNotNull())
                     .select("__u", F.col(prev).alias("__prev")), "__u")
               .where(cond)
               .groupBy("__u").agg(F.min("__ts").alias(f"t_{name}")))
        anchors = anchors.join(nxt, "__u", "left")
        prev = f"t_{name}"
    return anchors.withColumnRenamed("__u", user_col)


def funnel_report(events: DataFrame, steps: "list[tuple[str, str]]",
                  user_col: str = "user_id", ts_col: str = "ts_us",
                  within_us: int | None = None) -> DataFrame:
    """Step-level conversion summary over :func:`funnel_anchors`:
    ``(step, step_no, users, conv_from_prev, conv_from_first)`` with
    the ratios floor-quantized to 1e-6 (the corpus float-parity
    discipline).  One aggregate over the one-row-per-user anchor
    frame."""
    a = funnel_anchors(events, steps, user_col, ts_col, within_us)
    counts = a.agg(*[
        F.count(f"t_{name}").cast("long").alias(f"n_{i}")
        for i, (name, _) in enumerate(steps)]).first()
    rows = []
    n0 = counts[0] or 0
    prev_n = None
    for i, (name, _) in enumerate(steps):
        n = counts[i] or 0
        rows.append((
            name, i + 1, n,
            float(n) / prev_n if prev_n else (1.0 if n else 0.0),
            float(n) / n0 if n0 else 0.0))
        prev_n = n if n else None
    spark = events.sparkSession
    out = spark.createDataFrame(
        rows, "step string, step_no int, users long, "
              "conv_from_prev double, conv_from_first double")
    q = F.floor(F.col("conv_from_prev") * 1e6) / 1e6
    q2 = F.floor(F.col("conv_from_first") * 1e6) / 1e6
    return out.select("step", "step_no", "users",
                      q.alias("conv_from_prev"),
                      q2.alias("conv_from_first"))
