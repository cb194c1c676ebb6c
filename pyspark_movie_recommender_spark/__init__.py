"""PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the capabilities of the reference
repo ShanSabri/PySpark-Movie-Recommender (an RDD-era ALS movie recommender,
``/root/reference/recommender.py``), widened into a full analytics engine:

- relational core (scans, projections, filters, joins, aggregates, windows,
  set ops, top-k) — SURVEY.md §2.A parity, expressed on the DataFrame/SQL
  API so Catalyst owns physical planning;
- ALS recommendation pipeline (grid search, cold-start drop scoring,
  union-fold-in retrain, min-max rescale) — ``recommend.py``;
- LLM-data-pipeline operators (exact + fuzzy dedup, similarity search,
  text analysis, multimodal column plumbing) — ``operators/``;
- Structured Streaming over the events table — ``streaming/``.

Everything is designed for a multi-executor cluster at ~100 TB: no
driver-side collects in operator paths, broadcast hints for dimension
tables, AQE on, partial aggregation by construction, explicit schemas.
"""

from pyspark_movie_recommender_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
