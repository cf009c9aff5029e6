from clusterindices_spark.sources.fixtures import TABLES, load_table

__all__ = ["TABLES", "load_table"]
