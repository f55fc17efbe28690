"""Operator library: windows, top-N, distinct, joins, CEP, blacklist,
dedup, similarity — the SURVEY.md §2 inventory re-expressed Spark-first."""
