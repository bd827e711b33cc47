"""nifi_processors_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Re-expresses the *capabilities* of the reference NiFi processor set
(GilbertoBotaro/nifi_processors: SplitToAttribute, MergeTemplate,
ExecuteRuleEngine, GenerateData — see SURVEY.md) as a batch-incremental
changelog-apply engine on Spark DataFrames:

    change-event tail (binlog/WAL-style parquet epochs)
      -> typed envelope parse (from_json)
      -> rule validation / routing (compiled Column predicates)
      -> last-writer-wins dedup (window over (commit_seq, event_seq))
      -> key-partitioned MERGE upsert into an Iceberg-style table ("icelite")
      -> epoch commit markers (exactly-once replay)
      -> per-partition lineage + metrics

plus the training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) a 100 TB corpus pipeline needs.

Nothing here is a port of the reference's Java execution path; the
reference is cited in docstrings only for *what* is computed.
"""

__version__ = "0.1.0"
