from etfconstituentextractor_spark.plans.registry import QUERIES, ORACLES, query

__all__ = ["QUERIES", "ORACLES", "query"]
