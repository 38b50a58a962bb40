from etfconstituentextractor_spark.sources.tables import load, load_all

__all__ = ["load", "load_all"]
