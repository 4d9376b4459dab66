"""Streaming engine layer — Structured Streaming expressions of the
reference's DataStream/StreamExec operators (SURVEY.md §2.9), plus the
Reshape-equivalent adaptive skew layer (reshape.py).

Execution-model mapping (documented divergences from the reference):

- Flink is record-at-a-time; Spark is micro-batch. Mini-batch operators
  (MiniBatchAssigner, MiniBatch*AggFunction) are therefore free.
- Watermarks: `withWatermark` == BoundedOutOfOrdernessWatermarks; idleness
  detection has no Spark equivalent (documented gap).
- Flink's Reshape reroutes records of a *running* job; Spark cannot
  repartition a running stream, so the skew layer re-plans *between*
  micro-batches (foreachBatch) — same control loop, same two-phase ratio
  schedule, but with an explicit merge stage that makes rerouting exact
  for keyed aggregations (the reference's reroute is routing-only and
  inexact for keyed state — SURVEY.md §0.5).
"""
