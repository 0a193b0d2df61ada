"""datalake_toolkit_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``felipemsantos/datalake-toolkit`` (an AWS data-lake management toolkit:
EMR Spark ETL jobs, Lambda ingestion state machine, Hive/Glue catalog
migration) as an idiomatic Apache Spark engine:

- ``session``    — SparkSession factory with the reference's tuning envelope
                   translated to modern conf (512MB splits, AQE, Kryo-era
                   knobs that still matter).
- ``config``     — CLI > JSON-file > env parameter precedence, mirroring the
                   reference ETL jobs' param resolution.
- ``operators``  — the relational operator library (SURVEY.md §2): map/array
                   aggregations, ordered collects, consecutive ids,
                   explode/posexplode family, struct pack/unpack, join
                   assemblers, dedup windows.
- ``functions``  — scalar function pack (date parsing, URI normalization,
                   escaping, null normalizers) as Catalyst Column
                   expressions, not Python UDFs.
- ``sources``    — CSV/TSV/JSON/Parquet/JDBC readers and partitioned-table
                   writers (the data-plane ETL surface).
- ``catalog``    — metastore <-> catalog-document transforms and the
                   catalog-search surface.
- ``streaming``  — the file-ingestion state machine as Structured Streaming
                   (file source -> route -> transform -> partitioned sink,
                   with a ledger table maintained in foreachBatch).
- ``llm``        — large-scale training-data pipeline operators beyond the
                   reference surface: dedup (exact/minhash/simhash/ngram),
                   similarity search over embeddings, text analysis,
                   multimodal column plumbing.

Everything is DataFrame/SQL-first: plans are declared, Catalyst picks the
physical strategy, Python UDFs only where built-ins genuinely cannot
express the semantics.
"""

__version__ = "0.1.0"
