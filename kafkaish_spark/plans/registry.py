"""Central registry pairing each Spark query builder with its DuckDB
oracle SQL (the driver contract in ``__spark_entry__.py``).

Every operator from SURVEY.md §2 registers here via the ``@query``
decorator.  ``oracle=None`` marks rows-only checks (non-SQL-expressible
or engine-specific hashing), which the driver records as weaker checks.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str] = None
    tags: tuple = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple = (), bench: bool = False):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, tags, bench)
        return fn

    return deco


def _load_all() -> None:
    # import for registration side effects
    import kafkaish_spark.operators.relational  # noqa: F401
    import kafkaish_spark.operators.log_queries  # noqa: F401
    import kafkaish_spark.operators.llm  # noqa: F401
    import kafkaish_spark.operators.streaming_twins  # noqa: F401
    import kafkaish_spark.operators.multimodal  # noqa: F401
    import kafkaish_spark.operators.rollup  # noqa: F401
    import kafkaish_spark.operators.pipeline_ops  # noqa: F401
    import kafkaish_spark.operators.composites2  # noqa: F401
    import kafkaish_spark.operators.composites3  # noqa: F401
    import kafkaish_spark.operators.composites4  # noqa: F401
    import kafkaish_spark.operators.composites5  # noqa: F401
    import kafkaish_spark.operators.composites6  # noqa: F401
    import kafkaish_spark.operators.composites7  # noqa: F401
    import kafkaish_spark.operators.composites8  # noqa: F401
    import kafkaish_spark.operators.composites9  # noqa: F401
    import kafkaish_spark.operators.composites10  # noqa: F401
    import kafkaish_spark.operators.composites11  # noqa: F401
    import kafkaish_spark.operators.composites12  # noqa: F401


def all_queries() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def oracle_map() -> dict[str, str]:
    _load_all()
    return {n: s.oracle for n, s in _REGISTRY.items() if s.oracle is not None}
