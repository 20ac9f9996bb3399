"""Schema registry: the Spark analog of the reference's RelationSet.

The reference keeps a mutable ``map[uint32]Relation`` updated whenever
a Relation message arrives mid-stream (main.go:411-427) and zips
positional tuples against the *current* column list (main.go:452-472).
Here the registry keys on ``(schema, table)``, keeps every announced
version, and materializes canonical change rows (string maps) into a
typed DataFrame using the §1.2 type table — widest-schema semantics,
so a running query survives a column add exactly like the reference's
catalog swap (SURVEY.md §3.2): new columns are null-backfilled on old
events, dropped columns disappear from the current view.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_spark.cdc.typemap import spark_type_for_pg_name


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    pg_type: str
    is_key: bool = False

    @property
    def spark_type(self) -> T.DataType:
        return spark_type_for_pg_name(self.pg_type)


@dataclass
class TableSchema:
    schema: str
    table: str
    columns: list[ColumnSpec]
    version: int = 1

    @property
    def key_columns(self) -> list[str]:
        return [c.name for c in self.columns if c.is_key]

    def to_struct_type(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c.name, c.spark_type, True) for c in self.columns]
        )


@dataclass
class SchemaRegistry:
    """Versioned per-table schemas; evolution = announce a new version."""

    _tables: dict[tuple[str, str], list[TableSchema]] = field(default_factory=dict)

    def announce(
        self,
        schema: str,
        table: str,
        columns: list[tuple[str, str] | tuple[str, str, bool]],
    ) -> TableSchema:
        """Register a (new version of a) table schema — the Relation-
        message handler (main.go:425-427). Returns the new version."""
        specs = [
            ColumnSpec(c[0], c[1], bool(c[2]) if len(c) > 2 else False)
            for c in columns
        ]
        key = (schema, table)
        versions = self._tables.setdefault(key, [])
        ts = TableSchema(schema, table, specs, version=len(versions) + 1)
        versions.append(ts)
        return ts

    def current(self, schema: str, table: str) -> TableSchema:
        versions = self._tables.get((schema, table))
        if not versions:
            raise KeyError(
                f"no schema announced for {schema}.{table} "
                "(row event before Relation message — main.go:447-450)"
            )
        return versions[-1]

    def widest(self, schema: str, table: str) -> TableSchema:
        """Union of all announced versions (first-seen column order,
        latest type wins) — the parse schema that survives evolution."""
        versions = self._tables.get((schema, table))
        if not versions:
            raise KeyError(f"no schema announced for {schema}.{table}")
        seen: dict[str, ColumnSpec] = {}
        for v in versions:
            for c in v.columns:
                seen[c.name] = c  # latest version's type/keyness wins
        return TableSchema(schema, table, list(seen.values()), len(versions))

    def materialize(
        self,
        changes: DataFrame,
        schema: str,
        table: str,
        *,
        widest: bool = True,
        include_meta: bool = True,
    ) -> DataFrame:
        """Typed decode: canonical change rows → typed columns.

        The per-OID decoder dispatch of the reference (main.go:452-472)
        becomes one projection of ``try_cast`` expressions — invalid
        lexical forms decode to null instead of crash-stop, the
        permissive-mode upgrade SURVEY.md §2.1 (row 20) calls for.
        """
        ts = (
            self.widest(schema, table) if widest else self.current(schema, table)
        )
        scoped = changes.where(
            (F.col("src_schema") == schema) & (F.col("src_table") == table)
        )
        cols: list[Column] = []
        for c in ts.columns:
            name = F.lit(c.name)
            # NULL-vs-unchanged-TOAST: a column PRESENT in `after` with
            # a null value is a real SQL NULL and must NOT fall back to
            # the key/before image (that would make columns impossible
            # to null through the 'u' path); only a column ABSENT from
            # `after` is "unchanged" and takes the fallback.
            in_after = F.col("after").isNotNull() & F.map_contains_key(
                F.col("after"), name
            )
            raw = F.when(
                in_after, F.try_element_at("after", name)
            ).otherwise(
                F.coalesce(
                    F.try_element_at("key", name),
                    F.try_element_at("before", name),
                )
            )
            cols.append(raw.try_cast(c.spark_type).alias(c.name))
        meta = (
            [F.col("op"), F.col("lsn"), F.col("tx_id"), F.col("commit_ts")]
            if include_meta
            else []
        )
        return scoped.select(*meta, *cols)


# --- evolution compatibility policy ------------------------------------

# Numeric widening lattice: a type may evolve RIGHTWARD losslessly.
_WIDEN_ORDER = {"int2": 0, "int4": 1, "int8": 2, "float8": 3}


def widening_decision(old_pg_type: str, new_pg_type: str) -> str:
    """Classify an announced column-type change: ``keep`` (same type),
    ``widen`` (lossless numeric upcast along int2<int4<int8<float8 —
    auto-applied, existing data reads unchanged), or ``incompatible``
    (narrowing or cross-family — the rows must dead-letter rather
    than corrupt the catalog). This is the gate a production CDC
    deployment runs on every Relation announcement; the reference
    trusts upstream DDL implicitly (main.go:447-450), which a
    multi-writer deployment cannot."""
    if new_pg_type == old_pg_type:
        return "keep"
    if old_pg_type in _WIDEN_ORDER and new_pg_type in _WIDEN_ORDER:
        if _WIDEN_ORDER[new_pg_type] > _WIDEN_ORDER[old_pg_type]:
            return "widen"
    return "incompatible"
