"""etfconstituentextractor_spark — a PySpark-native analytics engine.

A ground-up, distributed re-expression of the query / data-processing
capabilities of the reference tool ``sap215/ETFConstituentExtractor``
(a single-threaded pandas+BeautifulSoup SEC NPORT-P scraper,
``/root/reference/ETFQuarterlyHoldingsExtractor.py:1-170``), built
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, Pandas
UDF / mapInPandas only where built-ins cannot express the semantics,
Structured Streaming for unbounded inputs.

Layout
------
- ``session``    — SparkSession factory (UTC, Arrow, AQE).
- ``schemas``    — explicit StructTypes for the test corpus tables.
- ``sources``    — typed readers (parquet/CSV/JSON) + partitioned sinks.
- ``functions``  — boundary parsing (money/date/pct) + oracle-parity helpers.
- ``operators``  — composed operators Spark lacks natively (as-of join,
                   dedup families, similarity search, text analysis).
- ``plans``      — the named query catalog (the driver-facing surface).
- ``streaming``  — Structured Streaming replay + windowed queries.
- ``pipeline``   — the reference's document→rows scraper as a distributed
                   mapInPandas stage with injectable fetch.
"""

from etfconstituentextractor_spark.session import get_session

__version__ = "0.1.0"

__all__ = ["get_session", "__version__"]
