from breweries_case_spark.io.reader import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
