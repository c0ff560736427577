"""tytodb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the TytoDB reference (see SURVEY.md).

Not a port: the reference (a single-node Rust row-store with typed CRUD,
conjunctive/disjunctive filters, UNION-ALL multi-source SEARCH, subquery
sources and cursor pagination — reference src/main.rs:69-89) defines WHAT
to compute; this package re-expresses it Spark-first (DataFrame/SQL +
Catalyst), and extends it with the analytics surface (joins, aggregations,
windows, set ops) plus LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) designed for 100 TB scale.
"""

from tytodb_spark.session import get_spark, tune
from tytodb_spark.catalog import TABLES, load_tables, register_views

__all__ = ["get_spark", "tune", "TABLES", "load_tables", "register_views"]

__version__ = "0.1.0"
