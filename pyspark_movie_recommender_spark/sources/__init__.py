"""Sources: parquet star-schema tables + MovieLens-style CSV readers."""

from pyspark_movie_recommender_spark.sources.tables import (
    TABLES,
    load_table,
    load_tables,
    register_views,
)
from pyspark_movie_recommender_spark.sources.movielens import (
    read_movies_csv,
    read_ratings_csv,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "read_movies_csv",
    "read_ratings_csv",
]
