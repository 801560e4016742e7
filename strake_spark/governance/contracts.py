"""Data contracts: schema expectations + semantic constraints per table.

Reference surface: ``config/contracts.yaml`` parsed into
ContractsConfig/Contract/ContractColumn/Constraint
(crates/common/src/models.rs:142-183) and checked by ``strake validate``
(crates/cli/src/commands/validate.rs — existence, type match, contract
rules); runtime enforcement is enterprise/closed-source there, so the
semantics implemented here follow the YAML's own documentation:

- ``strict: true`` = CLOSED SCHEMA: "querying columns NOT listed below
  will fail" (contracts.yaml:12). Enforced structurally: the engine
  re-registers a strict table's view as a projection of exactly the
  contract columns, so any query touching an unlisted column fails
  Spark analysis with a clear error — no AST policing required, and it
  composes with RLS/masking and every pushdown rung unchanged.
- column ``type`` = declared-type compatibility check against the live
  Spark schema (same tolerance groups as the reference's YAML schema
  builder, file.rs:373-382: integer family, float family, char family).
- ``constraints`` = row-level rules (gt/ge/lt/le/between/in/not_null/
  regex), validated in ONE aggregate pass per table — conditional
  counts, map-side combinable, no per-rule scans. Scale cost: one scan
  per contracted table regardless of rule count.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    type: str
    value: Any = None


@dataclass(frozen=True)
class ContractColumn:
    name: str
    data_type: str
    nullable: bool | None = None
    constraints: tuple[Constraint, ...] = ()


@dataclass(frozen=True)
class Contract:
    table: str
    strict: bool = False
    columns: tuple[ContractColumn, ...] = ()


@dataclass(frozen=True)
class ContractsConfig:
    contracts: tuple[Contract, ...] = ()
    enabled: bool = True


def parse_contracts(raw: dict | None) -> ContractsConfig | None:
    if not raw:
        return None
    contracts = []
    for c in raw.get("contracts", []):
        cols = []
        for col in c.get("columns", []):
            cols.append(
                ContractColumn(
                    name=col["name"],
                    data_type=str(col.get("type", "string")).lower(),
                    nullable=col.get("nullable"),
                    constraints=tuple(
                        Constraint(type=str(k.get("type", "")).lower(), value=k.get("value"))
                        for k in col.get("constraints", [])
                    ),
                )
            )
        contracts.append(
            Contract(table=c["table"], strict=bool(c.get("strict", False)), columns=tuple(cols))
        )
    return ContractsConfig(contracts=tuple(contracts))


# contract type name -> acceptable Spark type prefixes (tolerance groups
# mirror the reference's YAML type builder, file.rs:373-382)
_TYPE_OK: dict[str, tuple[str, ...]] = {
    "integer": ("int", "bigint", "smallint", "tinyint"),
    "int": ("int", "bigint", "smallint", "tinyint"),
    "bigint": ("bigint", "int"),
    "float": ("float", "double"),
    "double": ("double", "float"),
    "decimal": ("decimal", "double", "float"),
    "varchar": ("string", "varchar", "char"),
    "char": ("string", "varchar", "char"),
    "string": ("string", "varchar", "char"),
    "text": ("string", "varchar", "char"),
    "date": ("date", "timestamp"),
    "timestamp": ("timestamp", "date"),
    "boolean": ("boolean",),
}


def resolve_view(contract_table: str) -> str:
    """'pg.orders' (reference catalog spelling) -> 'pg_orders' (our view
    naming); already-flat names pass through."""
    return contract_table.replace(".", "_")


def validate_schema(spark: SparkSession, contract: Contract) -> list[str]:
    """Existence + type compatibility + closed-schema extras."""
    view = resolve_view(contract.table)
    errors: list[str] = []
    try:
        dtypes = dict(spark.table(view).dtypes)
    except Exception:
        return [f"{contract.table}: view '{view}' is not registered"]
    for col in contract.columns:
        actual = dtypes.get(col.name)
        if actual is None:
            errors.append(f"{contract.table}.{col.name}: missing from live schema")
            continue
        ok_prefixes = _TYPE_OK.get(col.data_type)
        if ok_prefixes is None:
            errors.append(
                f"{contract.table}.{col.name}: unknown contract type '{col.data_type}'"
            )
        elif not actual.startswith(ok_prefixes):
            errors.append(
                f"{contract.table}.{col.name}: declared {col.data_type}, live type {actual}"
            )
    if contract.strict:
        declared = {c.name for c in contract.columns}
        for extra in sorted(set(dtypes) - declared):
            errors.append(
                f"{contract.table}: column '{extra}' exists but is not in the strict contract"
            )
    return errors


def _violation_expr(col: ContractColumn, k: Constraint):
    c = F.col(col.name)
    nn = c.isNotNull()
    if k.type == "gt":
        bad = nn & ~(c > F.lit(k.value))
    elif k.type in ("ge", "gte"):
        bad = nn & ~(c >= F.lit(k.value))
    elif k.type == "lt":
        bad = nn & ~(c < F.lit(k.value))
    elif k.type in ("le", "lte"):
        bad = nn & ~(c <= F.lit(k.value))
    elif k.type == "between":
        lo, hi = k.value["min"], k.value["max"]
        bad = nn & ~c.between(F.lit(lo), F.lit(hi))
    elif k.type == "in":
        bad = nn & ~c.isin(*list(k.value))
    elif k.type in ("not_null", "notnull"):
        bad = c.isNull()
    elif k.type in ("regex", "matches"):
        bad = nn & ~c.rlike(str(k.value))
    else:
        raise ValueError(f"unknown constraint type '{k.type}' on {col.name}")
    return F.sum(F.when(bad, 1).otherwise(0))


def validate_data(
    spark: SparkSession, contract: Contract, sample_fraction: float | None = None
) -> dict[str, int]:
    """Row-rule violation counts, one aggregate scan for the whole
    table. Keys: 'column/constraint-type'.

    ``sample_fraction`` is the 100 TB knob: validate a DETERMINISTIC
    md5-bucket sample (same convention as the sampling inventory
    entries — reproducible, no RNG state) instead of every row. Counts
    then refer to the sample; a zero stays a strong signal, a non-zero
    is proof of violation either way."""
    view = resolve_view(contract.table)
    df = spark.table(view)
    if sample_fraction is not None:
        if not 0 < sample_fraction <= 1:
            raise ValueError("sample_fraction must be in (0, 1]")
        buckets = max(1, int(round(1 / sample_fraction)))
        key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in df.columns])
        df = df.filter(
            F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % buckets == 0
        )
    live = set(df.columns)
    exprs, keys = [], []
    for col in contract.columns:
        rules = list(col.constraints)
        if col.nullable is False and not any(
            r.type in ("not_null", "notnull") for r in rules
        ):
            rules.append(Constraint(type="not_null"))
        for k in rules:
            if col.name not in live:
                continue  # schema validation reports the absence
            exprs.append(_violation_expr(col, k).alias(f"{col.name}/{k.type}"))
            keys.append(f"{col.name}/{k.type}")
    if not exprs:
        return {}
    row = df.agg(*exprs).first()
    return {k: int(row[k] or 0) for k in keys}


# view name -> declared column order for STRICT (closed-schema) tables,
# populated by enforce_strict_views. The federation rungs consult this:
# pushed SQL must reference the remote physical table only through an
# inline subquery projecting exactly these columns, otherwise pushdown
# would silently expose columns the local projected view hides (the
# "querying columns NOT listed will fail" guarantee would hold only
# when pushdown DIDN'T fire). Process-global like REMOTE_TABLES.
STRICT_VIEWS: dict[str, tuple[str, ...]] = {}


def enforce_strict_views(
    spark: SparkSession, config: ContractsConfig
) -> tuple[list[str], list[str]]:
    """Closed-schema enforcement: re-register each strict table's view
    as a projection of exactly the contract columns, and record the
    projection in STRICT_VIEWS so every federation rung applies it to
    pushed SQL too. Returns (views_rewritten, errors). A contract that
    cannot bind (declared column missing from the live schema) is
    reported, NOT raised — one drifted contract must not brick the
    whole engine; the error resurfaces in validate_contracts() where
    the operator can see it."""
    import logging

    rewritten, errors = [], []
    for contract in config.contracts:
        if not contract.strict:
            continue
        view = resolve_view(contract.table)
        cols = [c.name for c in contract.columns]
        try:
            spark.table(view).select(*cols).createOrReplaceTempView(view)
        except Exception as e:
            msg = (
                f"strict contract on {contract.table} NOT enforced: cannot "
                f"project to declared columns ({str(e)[:200]})"
            )
            logging.getLogger("strake_spark.contracts").error(msg)
            errors.append(msg)
            # an unenforceable projection must not leave a stale (or
            # absent) pushdown guard: drop any previous registration
            STRICT_VIEWS.pop(view, None)
            continue
        STRICT_VIEWS[view] = tuple(cols)
        rewritten.append(view)
    return rewritten, errors
