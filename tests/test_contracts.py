"""Data contracts (reference config/contracts.yaml +
models.rs:142-183): schema validation, one-scan row-rule checks, and
strict closed-schema enforcement."""

from __future__ import annotations

import pytest

import strake_spark as ss
from strake_spark.governance.contracts import (
    Contract,
    ContractColumn,
    Constraint,
    parse_contracts,
    validate_data,
    validate_schema,
)
from tests.conftest import SF_DIR


def _cfg(contracts):
    return {
        "sources": [
            {
                "name": "k",
                "type": "parquet",
                "url": SF_DIR,
                "tables": [{"name": "orders"}, {"name": "lineitem"}],
            }
        ],
        "contracts": {"contracts": contracts},
    }


class TestParse:
    def test_reference_yaml_shape(self):
        cfg = parse_contracts(
            {
                "contracts": [
                    {
                        "table": "pg.orders",
                        "strict": True,
                        "columns": [
                            {"name": "o_orderkey", "type": "integer"},
                            {
                                "name": "o_totalprice",
                                "type": "decimal",
                                "constraints": [{"type": "gt", "value": 0}],
                            },
                        ],
                    }
                ]
            }
        )
        c = cfg.contracts[0]
        assert c.table == "pg.orders" and c.strict
        assert c.columns[1].constraints[0] == Constraint(type="gt", value=0)

    def test_empty_is_none(self):
        assert parse_contracts(None) is None
        assert parse_contracts({}) is None


class TestSchemaValidation:
    def test_clean_contract(self, spark):
        eng = ss.connect(_cfg([
            {"table": "k.orders", "columns": [
                {"name": "o_orderkey", "type": "bigint"},
                {"name": "o_totalprice", "type": "double"},
                {"name": "o_orderdate", "type": "timestamp"},
            ]}
        ]), spark=spark)
        rep = eng.validate_contracts(check_data=False)
        assert rep["valid"] and rep["errors"] == []

    def test_missing_and_mistyped(self, spark):
        ss.connect(_cfg([]), spark=spark)  # register views
        errs = validate_schema(
            spark,
            Contract(table="k.orders", columns=(
                ContractColumn(name="no_such", data_type="integer"),
                ContractColumn(name="o_orderpriority", data_type="integer"),
            )),
        )
        assert any("missing" in e for e in errs)
        assert any("declared integer, live type string" in e for e in errs)

    def test_strict_extra_columns_flagged(self, spark):
        ss.connect(_cfg([]), spark=spark)
        errs = validate_schema(
            spark,
            Contract(table="k.orders", strict=True, columns=(
                ContractColumn(name="o_orderkey", data_type="bigint"),
            )),
        )
        assert any("not in the strict contract" in e for e in errs)


class TestDataRules:
    def test_single_scan_counts(self, spark):
        ss.connect(_cfg([]), spark=spark)
        contract = Contract(table="k.lineitem", columns=(
            ContractColumn(name="l_quantity", data_type="double", constraints=(
                Constraint(type="between", value={"min": 0, "max": 100}),
            )),
            ContractColumn(name="l_returnflag", data_type="string", constraints=(
                Constraint(type="in", value=["R", "A", "N"]),
            )),
            ContractColumn(name="l_extendedprice", data_type="double", constraints=(
                Constraint(type="gt", value=10_000_000),  # deliberately violated
            )),
            ContractColumn(name="l_orderkey", data_type="bigint", nullable=False),
        ))
        counts = validate_data(spark, contract)
        assert counts["l_quantity/between"] == 0
        assert counts["l_returnflag/in"] == 0
        assert counts["l_extendedprice/gt"] > 0
        assert counts["l_orderkey/not_null"] == 0

    def test_report_flags_violations(self, spark):
        eng = ss.connect(_cfg([
            {"table": "k.lineitem", "columns": [
                {"name": "l_quantity", "type": "double",
                 "constraints": [{"type": "lt", "value": 1}]},
            ]}
        ]), spark=spark)
        rep = eng.validate_contracts()
        assert not rep["valid"]
        assert rep["data_violations"]["k.lineitem"]["l_quantity/lt"] > 0

    def test_unknown_constraint_rejected(self, spark):
        ss.connect(_cfg([]), spark=spark)
        with pytest.raises(ValueError, match="unknown constraint"):
            validate_data(spark, Contract(table="k.orders", columns=(
                ContractColumn(name="o_orderkey", data_type="bigint",
                               constraints=(Constraint(type="frobnicate"),)),
            )))


class TestStrictEnforcement:
    def test_unlisted_column_query_fails(self, spark):
        eng = ss.connect(_cfg([
            {"table": "k.orders", "strict": True, "columns": [
                {"name": "o_orderkey", "type": "bigint"},
                {"name": "o_totalprice", "type": "double"},
            ]}
        ]), spark=spark)
        # listed columns work
        assert eng.sql("SELECT o_orderkey, o_totalprice FROM k_orders").count() > 0
        # unlisted column -> analysis error (closed schema)
        with pytest.raises(Exception, match="o_orderpriority|UNRESOLVED"):
            eng.sql("SELECT o_orderpriority FROM k_orders").collect()

    def test_non_strict_table_unaffected(self, spark):
        eng = ss.connect(_cfg([
            {"table": "k.orders", "strict": False, "columns": [
                {"name": "o_orderkey", "type": "bigint"},
            ]}
        ]), spark=spark)
        assert eng.sql("SELECT o_orderpriority FROM k_orders").count() > 0


class TestCliValidate:
    def _write(self, tmp_path, contracts):
        import json
        p = tmp_path / "cfg.json"
        p.write_text(json.dumps({
            "sources": [{"name": "k", "type": "parquet", "url": str(SF_DIR),
                         "tables": [{"name": "orders"}]}],
            "contracts": {"contracts": contracts},
        }))
        return str(p)

    def test_validate_ok(self, tmp_path, capsys):
        from strake_spark.cli import main
        cfg = self._write(tmp_path, [
            {"table": "k.orders", "columns": [{"name": "o_orderkey", "type": "bigint"}]}
        ])
        assert main(["validate", cfg]) == 0
        out = capsys.readouterr().out
        assert "1 contracts" in out

    def test_validate_flags_bad_constraint(self, tmp_path, capsys):
        from strake_spark.cli import main
        cfg = self._write(tmp_path, [
            {"table": "k.orders", "columns": [
                {"name": "o_orderkey", "type": "bigint",
                 "constraints": [{"type": "frobnicate", "value": 1}]}
            ]}
        ])
        assert main(["validate", cfg]) == 1
        assert "unknown constraint" in capsys.readouterr().err

    def test_validate_flags_empty_strict(self, tmp_path, capsys):
        from strake_spark.cli import main
        cfg = self._write(tmp_path, [{"table": "k.orders", "strict": True, "columns": []}])
        assert main(["validate", cfg]) == 1
        assert "strict with no columns" in capsys.readouterr().err


class TestSampledValidation:
    def test_sampled_scan_is_deterministic_and_subsetted(self, spark):
        ss.connect(_cfg([]), spark=spark)
        contract = Contract(table="k.lineitem", columns=(
            ContractColumn(name="l_quantity", data_type="double", constraints=(
                Constraint(type="ge", value=0),
            )),
        ))
        a = validate_data(spark, contract, sample_fraction=0.25)
        b = validate_data(spark, contract, sample_fraction=0.25)
        assert a == b  # md5 sampling: no RNG state
        assert a["l_quantity/ge"] == 0
        with pytest.raises(ValueError):
            validate_data(spark, contract, sample_fraction=1.5)


class TestStrictDegrade:
    def test_unbindable_strict_contract_reports_not_bricks(self, spark):
        eng = ss.connect(_cfg([
            {"table": "k.orders", "strict": True, "columns": [
                {"name": "no_such_col", "type": "bigint"},
            ]}
        ]), spark=spark)  # connect must SUCCEED
        rep = eng.validate_contracts(check_data=False)
        assert not rep["valid"]
        assert any("NOT enforced" in e for e in rep["errors"])


class TestDataErrorIsInvalid:
    def test_scan_error_fails_validation(self, spark):
        eng = ss.connect(_cfg([
            {"table": "k.lineitem", "columns": [
                {"name": "l_quantity", "type": "double",
                 "constraints": [{"type": "ge", "value": 0}]},
            ]}
        ]), spark=spark)
        rep = eng.validate_contracts(sample_fraction=1.5)  # invalid knob
        assert not rep["valid"]
        assert any("data validation failed" in e for e in rep["errors"])
