"""Debezium Server properties codegen (C2) — the reference's `generate`
command (DebeziumConfiguration.java:19-52): derive topic prefix + db name
from ``source.prefix``, build table/column include lists from the routing
map, substitute ``{{KEY}}`` placeholders into a properties template.
Pure string transformation; no Spark involved.
"""

from __future__ import annotations

from .config import Config

# Same placeholder keys and generated keys as the reference's template
# (src/main/resources/templates/debezium.properties); layout is ours.
TEMPLATE = """\
# Generated Debezium Server configuration (cdc_dedupe_spark `generate`)

debezium.source.connector.class=io.debezium.connector.mysql.MySqlConnector
debezium.source.database.hostname=mysql-server
debezium.source.database.port=3306
debezium.source.database.user={{DB_USER}}
debezium.source.database.password={{DB_PASSWORD}}
debezium.source.database.server.id=12345
debezium.source.tasks.max=1
debezium.source.topic.prefix={{TOPIC_PREFIX}}
debezium.source.table.include.list={{DB_WATCH_TABLES}}
debezium.source.column.include.list={{DB_WATCH_COLUMNS}}
debezium.source.include.schema.changes=false
debezium.source.snapshot.mode=never

# strip schema envelopes (schemaless decode, RedisSource.java:58)
debezium.source.key.converter.schemas.enable=false
debezium.source.value.converter.schemas.enable=false

debezium.sink.type=redis
debezium.sink.redis.address=cdc-queue:6379
debezium.sink.redis.db.index=2
debezium.sink.redis.message.format=compact

debezium.source.offset.storage=io.debezium.server.redis.RedisOffsetBackingStore
debezium.source.offset.storage.redis.address=cdc-queue:6379
debezium.source.schema.history.internal=io.debezium.storage.redis.history.RedisSchemaHistory
debezium.source.schema.history.redis.address=cdc-queue:6379

debezium.server.name=cdc-server
debezium.server.port=8080
"""


def generate(cfg: Config, template: str = TEMPLATE) -> str:
    """Mirror of DebeziumConfiguration.generate (":25-52"): prefix split on
    '.', watch lists over every mapped table/column, {{KEY}} substitution."""
    prefix_split = cfg.source.prefix.split(".", 2)
    topic_prefix = prefix_split[0]
    db_name = prefix_split[1] if len(prefix_split) > 1 else ""

    watch_tables = []
    watch_columns = []
    for tbl, columns in cfg.mapping.items():
        watch_tables.append(f"{db_name}.{tbl}")
        for col in columns:
            watch_columns.append(f"{db_name}.{tbl}.{col}")

    out = template
    for key, val in {
        "TOPIC_PREFIX": topic_prefix,
        "DB_USER": "DB_USER",
        "DB_PASSWORD": "DB_PASSWORD",
        "DB_WATCH_TABLES": ",".join(watch_tables),
        "DB_WATCH_COLUMNS": ",".join(watch_columns),
    }.items():
        out = out.replace("{{" + key + "}}", val)
    return out
