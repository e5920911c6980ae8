"""Registry-wide oracle output-type scan (VERDICT r11 "What's wrong" #2).

The r11 driver hash failures were three oracles whose output columns
DuckDB silently widened to HUGEINT (`SUM() OVER ...`, `list_sum`):
values byte-equal to Spark's int64, but rendered differently by the
driver's value hash — and invisible locally because `.df()` converts
HUGEINT to float64/object before the old harness compared. This unit
makes the whole class unrepresentable: it walks EVERY registered oracle,
reads the declared DuckDB output types WITHOUT fetching rows, and fails
if any column is a hash-unsafe type (HUGEINT / UHUGEINT / DECIMAL).
The fix at each offending site is a one-line `CAST(... AS BIGINT)` (or
`AS DOUBLE`) in the oracle SQL.

Cheap by construction: no SparkSession; one lazy `con.sql()` relation
per oracle at sf0.001.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from cdc_dedupe_spark.queries import REGISTRY
from cdc_dedupe_spark.tables import TABLE_NAMES

from .parity import HASH_UNSAFE_DUCK_TYPES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def typecon():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def test_no_oracle_emits_hash_unsafe_types(typecon):
    offenders: list[tuple[str, str, str]] = []
    for name in sorted(REGISTRY):
        q = REGISTRY[name]
        if q.oracle is None:
            continue
        rel = typecon.sql(q.oracle)  # lazy: binds + types, no execution
        for col, typ in zip(rel.columns, rel.types):
            base = str(typ).upper().split("(")[0].strip()
            if base in HASH_UNSAFE_DUCK_TYPES:
                offenders.append((name, col, str(typ)))
    assert not offenders, (
        "oracle output columns with driver-hash-unsafe DuckDB types "
        "(CAST them to BIGINT/DOUBLE in the oracle SQL): "
        f"{offenders}"
    )
