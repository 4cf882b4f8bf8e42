"""Source builders: fixture parquet tables, Kafka streams, CDC config reads.

Mirrors the capability surface of the reference's
``FlinkSourceUtil.java:24-77`` (Kafka DataStream / SQL sources, MySQL CDC) and
``JdbcUtil.java:37-68`` (bounded config reads) behind a dual-mode IO layer:
fixture mode (files, what the tests/driver exercise) and kafka mode (same
topologies against live brokers).
"""

from .fixtures import TABLES, load_tables, register_views, table_path

__all__ = ["TABLES", "load_tables", "register_views", "table_path"]
