from kafkaish_spark.plans.registry import QuerySpec, all_queries, oracle_map, query

__all__ = ["QuerySpec", "all_queries", "oracle_map", "query"]
