"""PySpark-native user-behavior analytics engine.

A from-scratch re-expression of the query surface of
``thestyleofme/user-behavior-analysis`` (a Flink 1.10 DataStream project,
see SURVEY.md) as an idiomatic PySpark library: DataFrame/SQL for every
batch-expressible analysis, Structured Streaming with stateful operators
for the event-time/CEP semantics, plus large-scale training-data pipeline
operators (dedup, similarity search, text analysis) the reference lacks.

Design stance (SURVEY.md §7): declare logical plans with the DataFrame
API and let Catalyst/Tungsten plan them; no RDDs, no row-at-a-time UDFs
in hot paths; state/timers via Structured Streaming stateful APIs only.
"""

__version__ = "0.1.0"
