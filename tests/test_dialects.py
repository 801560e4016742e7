"""Dialect function-mapper golden tests (reference:
crates/sql/tests/dialects/{oracle,snowflake}.rs style — assert the
generated SQL text) plus end-to-end sqlite rename through federation."""

from __future__ import annotations

import json

import duckdb
import pytest

from strake_spark.plans import federation
from strake_spark.plans.dialects import (
    ORACLE,
    SNOWFLAKE,
    SQLITE,
    rename_functions,
    rules_for,
)


def _roundtrip(sql: str, rules) -> str:
    from strake_spark.plans.dialects import transpile

    out = transpile(sql, rules)
    assert out is not None, f"unparseable: {sql}"
    return out


class TestOracleGoldens:
    def test_coalesce_to_nvl(self):
        out = _roundtrip("SELECT coalesce(a, b) FROM t", ORACLE)
        assert "NVL(a, b)" in out

    def test_strpos_to_instr(self):
        out = _roundtrip("SELECT strpos(name, 'x') FROM t", ORACLE)
        assert "INSTR(" in out and "'x'" in out

    def test_string_agg_to_listagg(self):
        out = _roundtrip("SELECT string_agg(name, ',') FROM t", ORACLE)
        assert "LISTAGG(" in out

    def test_nested_functions_all_renamed(self):
        out = _roundtrip(
            "SELECT coalesce(strpos(coalesce(a, b), 'z'), 0) FROM t", ORACLE
        )
        assert out.count("NVL(") == 2 and "INSTR(" in out

    def test_literal_containing_function_name_untouched(self):
        out = _roundtrip("SELECT coalesce(a, 'coalesce(x,y)') FROM t", ORACLE)
        assert "'coalesce(x,y)'" in out and "NVL(a" in out


class TestMysqlGoldens:
    def test_identifier_quotes_become_backticks(self):
        from strake_spark.plans.dialects import MYSQL

        out = MYSQL.fix_text('SELECT "a", "b" FROM "t" WHERE "a" = 1')
        assert out == "SELECT `a`, `b` FROM `t` WHERE `a` = 1"

    def test_double_quote_inside_literal_preserved(self):
        """The " -> ` quoting fix must never rewrite quotes inside a
        pushed string literal — a corrupted literal makes the remote
        filter under-inclusive (silent wrong results)."""
        from strake_spark.plans.dialects import MYSQL

        out = MYSQL.fix_text("SELECT \"name\" FROM \"t\" WHERE \"c\" = 'say \"hi\"'")
        assert out == "SELECT `name` FROM `t` WHERE `c` = 'say \"hi\"'"

    def test_escaped_single_quote_stays_one_literal(self):
        from strake_spark.plans.dialects import MYSQL

        out = MYSQL.fix_text("SELECT \"x\" FROM \"t\" WHERE \"c\" = 'it''s \"q\"' AND \"d\" = 2")
        assert "'it''s \"q\"'" in out and '`d` = 2' in out

    def test_count_star_fix_skips_literals(self):
        from strake_spark.plans.dialects import DUCKDB

        out = DUCKDB.fix_text("SELECT count_star() FROM t WHERE c = 'count_star()'")
        assert out == "SELECT count(*) FROM t WHERE c = 'count_star()'"

    def test_coalesce_fix_skips_literals(self):
        from strake_spark.plans.dialects import ORACLE

        out = ORACLE.fix_text("SELECT COALESCE(a, 'COALESCE(') FROM t")
        assert out == "SELECT NVL(a, 'COALESCE(') FROM t"


class TestSnowflakeGoldens:
    def test_string_agg_to_listagg(self):
        out = _roundtrip("SELECT string_agg(x, ';') FROM t", SNOWFLAKE)
        assert "LISTAGG(" in out

    def test_ifnull_to_nvl(self):
        out = _roundtrip("SELECT ifnull(a, 0) FROM t", SNOWFLAKE)
        assert "NVL(a, 0)" in out


class TestRulesRouter:
    def test_known_dialects(self):
        assert rules_for("oracle").requires_from_dual
        assert not rules_for("postgres").function_renames
        assert rules_for("postgresql").supports_distinct_on
        assert rules_for("mariadb").function_renames["string_agg"] == "GROUP_CONCAT"

    def test_unknown_dialect_identity(self):
        r = rules_for("somethingelse")
        assert r.function_renames == {}


class TestSqliteEndToEnd:
    def test_string_agg_pushdown_executes(self, spark, tmp_path):
        """string_agg renamed to group_concat must actually run in
        SQLite through the federation path."""
        import sqlite3

        import strake_spark as ss

        path = str(tmp_path / "d.sqlite")
        con = sqlite3.connect(path)
        con.execute("CREATE TABLE pets (owner TEXT, pet TEXT)")
        con.executemany(
            "INSERT INTO pets VALUES (?,?)",
            [("ann", "cat"), ("ann", "dog"), ("bob", "fish")],
        )
        con.commit()
        con.close()
        eng = ss.connect(
            {"sources": [{"name": "sq", "type": "sqlite", "url": path}]}, spark=spark
        )
        df, plan = federation.plan_sql(
            eng.spark,
            "SELECT owner, string_agg(pet, ',') AS pets FROM sq_pets "
            "GROUP BY owner ORDER BY owner",
        )
        assert plan is not None, "expected sqlite pushdown"
        assert "group_concat" in plan.rewritten_sql
        rows = df.collect()
        assert [r.owner for r in rows] == ["ann", "bob"]
        assert rows[0].pets == "cat,dog" and rows[1].pets == "fish"


class TestLiteralSplitter:
    """_split_literals underpins every textual rewrite: its invariants
    must hold for arbitrary input, not just goldens."""

    def test_roundtrip_and_classification(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from strake_spark.plans.dialects import _split_literals

        @settings(max_examples=300, deadline=None)
        @given(st.text(alphabet="ab' \"`~x()_,=", max_size=60))
        def check(sql):
            segs = list(_split_literals(sql))
            # lossless: concatenation reproduces the input exactly
            assert "".join(s for s, _ in segs) == sql
            for seg, is_literal in segs:
                if is_literal:
                    assert seg.startswith("'")
                else:
                    assert "'" not in seg

        check()

    def test_adjacent_literals(self):
        from strake_spark.plans.dialects import _split_literals

        segs = list(_split_literals("'a''b' x 'c'"))
        assert "".join(s for s, _ in segs) == "'a''b' x 'c'"
        # 'a''b' is ONE literal (escaped quote), not two
        assert [s for s, lit in segs if lit] == ["'a''b'", "'c'"]
