"""Query registry: one entry per implemented operator (SURVEY.md §2).

Each registered query binds
- a Spark callable ``(spark, sf_dir) -> DataFrame`` (the engine surface), and
- optionally an ANSI-SQL oracle string DuckDB runs on the same parquet
  (the correctness gate; None for non-SQL-expressible operators, which
  get rows-only driver checks plus golden unit tests).

Keeping the pair in one decorator call (same module, same commit) is the
repo's invariant: every operator claimed done has both halves.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None,
             tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle,
                                  tags=tuple(tags), doc=(fn.__doc__ or "").strip())
        return fn
    return deco
