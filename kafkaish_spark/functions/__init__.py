from kafkaish_spark.functions.exact import davg, davg_sql, dsum, dsum_sql
from kafkaish_spark.functions.vectors import cosine_sim, dot, norm

__all__ = ["dsum", "davg", "dsum_sql", "davg_sql", "cosine_sim", "dot", "norm"]
