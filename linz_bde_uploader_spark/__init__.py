"""linz_bde_uploader_spark — a PySpark-native re-expression of
linz/linz-bde-uploader (reference: /root/reference, v2.11.1).

The reference is a Perl + PL/pgSQL batch ETL pipeline that loads LINZ
Bulk Data Extract (BDE) files into PostgreSQL: dataset discovery, .crs
file parsing/cleansing, bulk load, keyed CDC merge (level 5), full-table
diff (level 0 incremental), row-count tolerance validation, and a
job/lock/stats control ledger.

This package re-expresses those operators Spark-first:

- ``sources/``   — .crs reader (header -> StructType, cleanse stage),
                   BDE repository walker (dataset discovery/pruning).
- ``catalog/``   — tables.conf-compatible table registry.
- ``operators/`` — the CDC core (classify/apply/full-diff/tolerance),
                   plus large-scale training-data operators: dedup
                   (exact/minhash-LSH/simhash/jaccard), similarity
                   search (cosine top-k, LSH-bucketed), text analysis,
                   multimodal column plumbing.
- ``functions/`` — portable column-expression helpers (hashing,
                   text metrics) shared by operators and oracles.
- ``control/``   — job ledger: upload / upload_table / upload_stats,
                   watermarks, locks (single-writer discipline).
- ``streaming/`` — Structured Streaming re-expression of the dataset
                   poll loop + event-stream operators.
- ``plans/``     — headline analytical query library used by bench.py.
"""

__version__ = "0.1.0"
