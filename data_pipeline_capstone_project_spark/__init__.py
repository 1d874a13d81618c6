"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference social-media ETL pipeline
(lewi0332/Data-Pipeline-Capstone-Project), re-expressed Spark-first.

Layout:
    session    - tuned SparkSession factory
    schemas    - explicit StructType schemas (posts / stats / testdata)
    sources    - batch + streaming readers (parquet/json/csv/binary)
    functions  - scalar & aggregate expression helpers
    operators  - relational operators (flatten, upsert, topk, asof,
                 quality, dedup, similarity, text, colors, multimodal)
    plans      - end-to-end query plans (history fact, engagement aggs)
    streaming  - incremental latest-wins upsert (Structured Streaming)
"""

__version__ = "0.1.0"
