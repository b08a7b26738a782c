"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API) —
the extension seam for sources Spark has no built-in reader for
(internal feeds, bespoke binary formats, synthetic generators).

`SyntheticDocsDataSource` generates a deterministic document corpus
from (n_docs, seed-free md5 arithmetic): the same recipe on any
executor yields the same rows, so the source is restartable and
oracle-checkable. The reader implements `partitions()` so generation
is DISTRIBUTED — each partition materialises only its id range (the
property that matters at scale: a custom source must shard, not yield
from the driver).

Filter pushdown: `pushFilters` accepts `doc_id` range predicates
(EqualTo / GreaterThan(OrEqual) / LessThan(OrEqual)) and narrows each
partition's generation range — demonstrating that the v2-style
pushdown contract reaches Python sources too; unsupported filters are
returned for Spark to re-apply.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

_WORDS = (
    "key agg row scan slow fast table value part hash merge batch "
    "spark line sort window shuffle join filter"
).split()


def _doc_text(doc_id: int) -> str:
    """Deterministic pseudo-text: word picks driven by md5(doc_id||i)."""
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    n_tokens = 8 + int(h[:2], 16) % 9
    words = []
    for i in range(n_tokens):
        hi = hashlib.md5(f"{doc_id}|{i}".encode()).hexdigest()
        words.append(_WORDS[int(hi[:4], 16) % len(_WORDS)])
    return " ".join(words)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 100))
        self.n_parts = int(options.get("n_partitions", 4))
        self.lo = 0
        self.hi = self.n_docs

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        supported = (EqualTo, GreaterThan, GreaterThanOrEqual,
                     LessThan, LessThanOrEqual)
        for f in filters:
            col = getattr(f, "attribute", None)
            if col != ("doc_id",) or not isinstance(f, supported):
                yield f  # unsupported: Spark re-applies it after the scan
                continue
            v = f.value
            if isinstance(f, EqualTo):
                self.lo, self.hi = max(self.lo, v), min(self.hi, v + 1)
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, v + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, v)
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, v)
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, v + 1)

    def partitions(self) -> Sequence[InputPartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        span = max(1, (hi - lo + self.n_parts - 1) // self.n_parts)
        return [
            _RangePartition(s, min(s + span, hi))
            for s in range(lo, hi, span)
        ] or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            text = _doc_text(doc_id)
            yield (doc_id, text, len(text))


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, n_chars bigint"

    def reader(self, schema) -> DataSourceReader:
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    # Python-source filter pushdown is off by default in Spark 4.1;
    # without it a reader implementing pushFilters() raises at plan time
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticDocsDataSource)
