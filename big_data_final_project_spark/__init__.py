"""big_data_final_project_spark — a PySpark-native analytics engine.

A brand-new, Spark-first rebuild of the query / data-processing
capabilities of the reference project Aero-Kent/Big-Data-Final-Project
(a Kafka -> MongoDB -> Streamlit weather-dashboard pipeline; see
SURVEY.md), generalized into a full operator library:

- reference-parity queries (filter/project/unpivot/time-range/summary,
  reference app.py:274-510) re-expressed on Spark DataFrames,
- core relational operators (joins, grouped aggregation, windows,
  set ops, pivot, rollup/cube) the reference lacks,
- Structured Streaming ingest mirroring the reference's Kafka pipeline
  (producer.py:169-210 / app.py:226-272) with exactly-once upgrades,
- LLM-data-pipeline operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard), embedding similarity search, text analysis,
  multimodal column plumbing.

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join selection and AQE; Python touches data only through
Arrow-batched pandas UDFs on the few genuinely non-relational paths.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .registry import catalog, oracle_catalog  # noqa: F401
