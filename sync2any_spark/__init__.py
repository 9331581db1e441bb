"""sync2any_spark — a PySpark-native fulltext engine.

A from-scratch inverted-index build + BM25 query engine over tables of
multi-turn transcripts, providing the combined capability of the reference
pipeline (sync2any CDC ingest, /root/reference) and its Elasticsearch target
(standard analyzer + BM25 top-k), re-expressed Spark-first:

- columnar DataFrame pipeline end-to-end (the reference is row-at-a-time,
  see SURVEY.md §1.1);
- SPIMI posting construction in Arrow-batched pandas UDFs (no per-row Python);
- delta-gap + varbyte compressed posting blocks with block-max metadata;
- block-max WAND top-k, rank-identical to the exact Lucene BM25 formula
  (k1=1.2, b=0.75);
- resumable, manifest-checkpointed index builds with lineage + metrics.
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
BLOCK_SIZE = 128
