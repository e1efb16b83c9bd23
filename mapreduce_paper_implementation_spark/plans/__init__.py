from mapreduce_paper_implementation_spark.plans.queries import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
