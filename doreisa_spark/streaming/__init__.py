"""Streaming / iteration layer — the Spark analog of doreisa's ingest and
driver loop (reference: doreisa/window_api.py, doreisa/simulation_node.py,
doreisa/head_node.py).

Two paths:

- ``simulation``: the exact semantics of the reference's ``run_simulation``
  — per-timestep chunk ingest, multi-array synchronization, sliding
  windows (short at stream start), backpressure, plan-ahead preparation —
  re-expressed over chunk-row DataFrames (see plans/chunked.py).
- ``structured``: event-time analytics on Structured Streaming (watermarks,
  tumbling/sliding/session windows, foreachBatch sinks) for the
  SQL-expressible streaming surface.
"""

from doreisa_spark.streaming.simulation import (  # noqa: F401
    ArrayDefinition,
    SimulationDriver,
    run_simulation,
)
